package graft

import org.apache.spark.sql.functions._

/** Round-6 wave 2: REPLACE INTO, union-scan overlay reads, ANALYZE
  * statistics, remaining MySQL string builtins, document chunking
  * (all oracle-checked; invariants + plan shapes pinned here). */
class Wave8Spec extends SparkSpecBase {

  private def q(name: String) = Registry.all.find(_.name == name).get.run(t)

  test("replace: staged rows land whole, both unique-key paths evict") {
    val res = q("q_replace").cache()
    val stagedKeys = t.orders.filter(col("o_orderkey") % 13 === 0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(stagedKeys.nonEmpty)
    // Every staged pk is present exactly once and carries the staged
    // row (status R, price 0) — never a merged hybrid.
    val stagedOut = res.filter(col("o_orderkey").isin(
      stagedKeys.toSeq.map(Long.box): _*)).collect()
    assert(stagedOut.length == stagedKeys.size)
    stagedOut.foreach { r =>
      assert(r.getAs[String]("o_orderstatus") == "R")
      assert(r.getAs[Double]("o_totalprice") == 0.0)
      assert(r.getAs[Long]("uk") == (r.getAs[Long]("o_orderkey") + 1) * 2 + 1)
    }
    // uk-path eviction: a base row whose pk = staged_pk + 1 exists in
    // orders but its ORIGINAL (pk, uk=2pk+1) version must be gone —
    // its uk was claimed by the staged row.
    val orderKeys = t.orders.select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val evictedViaUk = stagedKeys.map(_ + 1).intersect(orderKeys)
    assert(evictedViaUk.nonEmpty, "uk-eviction path must be exercised")
    val survivorsAtEvicted = res
      .filter(col("o_orderkey").isin(evictedViaUk.toSeq.map(Long.box): _*))
      .count()
    assert(survivorsAtEvicted == 0,
      "rows evicted through the second unique key must not survive")
    // Count identity: base - pk_evictions - uk_evictions + staged.
    val base = t.orders.count()
    assert(res.count() ==
      base - stagedKeys.size - evictedViaUk.size + stagedKeys.size)
  }

  test("union scan: overlay counts reconcile with the buffer") {
    val res = q("q_union_scan").collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("total"))).toMap
    val nBase = t.orders.count()
    val nDel = t.orders.filter(col("o_orderkey") % 31 === 5).count()
    val nUpd = t.orders.filter(col("o_orderkey") % 17 === 3 &&
      col("o_orderkey") % 31 =!= 5).count()
    val nIns = t.orders.filter(col("o_orderkey") % 41 === 7).count()
    assert(nDel > 0 && nUpd > 0 && nIns > 0)
    assert(res("U")._1 == nUpd, "updated rows supersede their base versions")
    assert(res("I")._1 == nIns && res("I")._2 == nIns * 1.0)
    assert(res.values.map(_._1).sum == nBase - nDel + nIns)
  }

  test("analyze: histogram is equi-depth and stats rows are exact") {
    val rows = q("q_analyze").collect()
    val hist = rows.filter(_.getAs[String]("section") == "hist")
      .sortBy(_.getAs[Long]("bucket"))
    assert(hist.map(_.getAs[Long]("bucket")).sameElements(0L until 8L))
    val n = t.lineitem.count()
    val cnts = hist.map(_.getAs[Long]("cnt"))
    assert(cnts.sum == n)
    assert(cnts.max - cnts.min <= 1, "equi-depth: bucket sizes differ by <=1")
    // Bucket bounds tile the sorted domain: hi(b) <= lo(b+1).
    hist.sliding(2).foreach { p =>
      assert(p(0).getAs[Double]("hi") <= p(1).getAs[Double]("lo"))
    }
    val colStats = rows.filter(_.getAs[String]("section") == "col")
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(colStats.keySet ==
      Set("l_quantity", "l_discount", "l_extendedprice"))
    assert(colStats("l_quantity").getAs[Long]("cnt") == n)
    assert(colStats("l_discount").getAs[Long]("ndv") ==
      t.lineitem.select("l_discount").distinct().count())
  }

  test("analyze plan: global rank is the two-phase prefix sum, not one task") {
    val plan = q("q_analyze").queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(rng"),
      "intra-range rank must run on a partitioned window")
  }

  test("string3: soundex/substring_index/find_in_set spot values") {
    val r = q("q_func_string3").filter(col("c_custkey") === 2).collect()(0)
    assert(r.getAs[String]("word") == "Ashcraft")
    assert(r.getAs[String]("sdx") == "A261")
    assert(r.getAs[Int]("fis") >= 1 && r.getAs[Int]("fis") <= 5)
    assert(r.getAs[String]("si_pre").startsWith("Customer#"))
    // name is Customer#%09d → the -2 suffix keeps the final digits
    // with one rejoined '0'.
    assert(r.getAs[String]("si_suf") == "02")
    assert(Set(-1, 0, 1)(r.getAs[Int]("sc")))
  }

  test("chunking: stride/window reconstruct the document, zero shuffle") {
    val chunks = q("t_chunk").cache()
    val docs = t.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // Spot-check one long doc: chunk 0 is the prefix, consecutive
    // chunks overlap by 60 chars, and the last chunk reaches the end.
    val (did, text) = docs.maxBy(_._2.length)
    val cs = chunks.filter(col("doc_id") === did)
      .sortWithinPartitions("chunk_idx").collect()
      .sortBy(_.getAs[Long]("chunk_idx"))
    assert(cs.head.getAs[String]("chunk_text") == text.take(240))
    cs.sliding(2).foreach { p =>
      val a = p(0).getAs[String]("chunk_text")
      val b = p(1).getAs[String]("chunk_text")
      val start = p(0).getAs[Long]("chunk_idx") * 180
      // A chunk is 240 chars unless the document ends inside its
      // window — that can also hit the penultimate chunk, since the
      // last two windows share the final 60-char stride remainder.
      assert(a.length == math.min(240L, text.length - start),
        "chunk length must be min(window, remaining)")
      assert(a.substring(180) == b.take(a.length - 180),
        "stride overlap region must agree between adjacent chunks")
    }
    val last = cs.last
    assert(last.getAs[Long]("chunk_idx") * 180 +
      last.getAs[Long]("chunk_len") == text.length,
      "chunks cover the full document")
    // Map-side plan: scan → generate → project, no exchange
    // (fresh instance — cache() above would hide the shape).
    val plan = q("t_chunk").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must not shuffle")
  }
}
