package graft

import org.apache.spark.sql.functions._

class Wave13Spec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  test("q_cached_table serves reads from the in-memory lease") {
    val df = q("q_cached_table")
    val plan = df.queryExecution.executedPlan.toString
    // The dimension scan must be the cache, not the parquet file —
    // the table/tables/cache.go lease-read contract.
    assert(plan.contains("InMemoryTableScan"),
      s"nation not read from cache:\n$plan")
    val viaCache = df.collect().map(_.toSeq).toSet
    // Parity: dropping the cache must not change a single value.
    t.nation.unpersist(blocking = true)
    val base = q("q_cached_table").collect().map(_.toSeq).toSet
    assert(viaCache == base && base.size == 25)
    t.nation.unpersist(blocking = true)
  }

  test("q_temp_table: global temp crosses sessions, local does not") {
    val df = q("q_temp_table")
    // Temp-table rows are STORED (cache), so the report and the cut
    // subquery read InMemoryTableScan and orders is scanned once.
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"),
      s"temp table rows not stored:\n$p")
    df.collect() // registers both views
    try {
      val other = spark.newSession()
      // Global temporary table: definition shared across sessions
      // (table/temptable's GLOBAL half).
      assert(other.table("global_temp.gtmp_spend_cut").collect()
        .length == 1)
      // Local temporary table: session-scoped, invisible elsewhere.
      intercept[Exception] { other.table("tmp_cust_orders").collect() }
      assert(spark.table("tmp_cust_orders").columns
        .sameElements(Array("o_custkey", "n_ord", "spend")))
    } finally {
      // DROP TEMPORARY TABLE: release the stored rows and both
      // definitions (the reference drops them with the session; the
      // shared spec session lives on, so clean up explicitly).
      spark.table("tmp_cust_orders").unpersist(blocking = true)
      spark.catalog.dropTempView("tmp_cust_orders")
      spark.catalog.dropGlobalTempView("gtmp_spend_cut")
      spark.catalog.dropTempView("wave13_customer")
    }
  }

  test("q_auto_random: shard bits and sequence round-trip") {
    val rows = q("q_auto_random").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val (shard, n, minId, maxId, okN) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))
      // Every id decodes back to (shard, seq): the bit layout is
      // lossless.
      assert(okN == n, s"shard $shard: $okN of $n decode")
      // The shard owns a disjoint 2^59-wide range, ids dense within.
      assert(minId == (shard << 59) && maxId == (shard << 59) + n - 1)
    }
  }

  test("q_show_stats: per-column two-phase NDV branches — each scan " +
      "pruned to its column, no Expand row multiplication") {
    val df = q("q_show_stats")
    val p = df.queryExecution.executedPlan.toString
    // Five single-distinct branches, NOT one Aggregate with five
    // countDistincts: the fused form rides ONE scan but multiplies
    // every row x6 through Catalyst's Expand rewrite — measured 2.4x
    // slower at sf0.1 than five column-pruned scans reading the same
    // total bytes (r17: 3.54 s -> 1.49 s, controls flat).
    assert("Scan parquet".r.findAllIn(p).size == 5,
      s"expected five per-column orders scans:\n$p")
    assert(!p.contains("Expand"),
      s"the multi-distinct Expand rewrite is back:\n$p")
    // Column pruning is the whole trade: each branch's scan must
    // read exactly its own column.
    for (c <- Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
      assert(p.contains(s"ReadSchema: struct<$c:"),
        s"branch scan for $c is not pruned to it:\n$p")
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("o_orderkey", "o_custkey", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    val nRows = t.orders.count()
    assert(rows.values.forall(_._1 == nRows))
    // Primary key: ndv == rows, no nulls.
    assert(rows("o_orderkey")._2 == nRows && rows("o_orderkey")._3 == 0)
  }

  test("q_insert_ignore keeps stored rows and appends only fresh keys") {
    val res = q("q_insert_ignore")
    // A conflicting incoming row must never surface: no stored key
    // carries the poisoned status.
    assert(res.filter(col("o_orderstatus") === "X").count() == 0,
      "INSERT IGNORE let a conflicting row overwrite")
    val base = t.orders.count()
    val fresh = t.orders.filter(col("o_orderkey") % 97 === 0).count()
    assert(res.count() == base + fresh)
    assert(res.filter(col("o_orderstatus") === "I").count() == fresh)
    // Stored rows untouched bit-for-bit.
    val kept = res.filter(col("o_orderkey") < 2000000000000L)
      .collect().map(_.toSeq).toSet
    val orig = t.orders.select("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice").collect().map(_.toSeq).toSet
    assert(kept == orig)
  }

  test("q_stats_histogram is equi-DEPTH and built without a window") {
    val df = q("q_stats_histogram")
    val p = df.queryExecution.executedPlan.toString
    // The build is one percentile agg + map-side bucketing — an
    // ntile spelling would plan a single-partition global Window.
    assert(!p.contains("Window"), s"histogram grew a window:\n$p")
    val rows = df.collect().map(r => r.getInt(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(rows.map(_._1).sameElements(1 to 8))
    // Equal-depth: no bucket more than 2x the smallest (exact eighths
    // up to boundary ties).
    val ns = rows.map(_._2._1)
    assert(ns.max <= 2 * ns.min, s"buckets unbalanced: ${ns.toSeq}")
    // Value ranges are ordered and STRICTLY disjoint — ties-left
    // bucketing means a value can never appear in two buckets, so
    // hi1 == lo2 would itself be an overlap.
    rows.sliding(2).foreach { case Array((_, (_, _, hi1)), (_, (_, lo2, _))) =>
      assert(hi1 < lo2, "bucket ranges overlap")
    case _ => ()
    }
  }

  test("q_func_pinyin orders by pinyin, not code points") {
    val ws = q("q_func_pinyin").collect().map(_.getString(1))
    // 啊(ā) 百(bǎi) 大(dà) 国(guó) 人(rén) 数(shù) 文(wén) 中(zhōng)
    assert(ws.toSeq == Seq("啊", "百", "大", "国", "人", "数", "文", "中"),
      s"pinyin order broken: ${ws.mkString(",")}")
    // Code-point order would differ (中 U+4E2D sorts before 啊 U+554A).
    assert(ws.toSeq != ws.sorted.toSeq)
  }

  test("q_func_misc2 exercises all units and decimal-width rules") {
    val rows = q("q_func_misc2").collect()
    val fmts = rows.map(_.getAs[String]("fmt_bytes"))
    assert(fmts.exists(_.endsWith(" Bytes")))
    assert(fmts.exists(_.endsWith(" KB")))
    assert(fmts.exists(_.endsWith(" MB")))
    assert(fmts.exists(_.endsWith(" GB")))
    // All three decimal-width rules of the shared renderer fire:
    // divisible → no point (staged in GB), <10 units → 2dp (KB/MB),
    // ≥10 units → 1dp (util/memory/tracker.go:433 arithmetic).
    assert(fmts.exists(s => s.endsWith(" GB") && !s.contains(".")))
    assert(fmts.exists(s =>
      s.endsWith(" GB") && s.matches("""\d+\.\d [A-Z]B""")))
    assert(fmts.exists(s => s.matches("""\d+\.\d\d [A-Z]B""")))
    // make_time renders zero-padded clock fields.
    val mk = rows.map(_.getAs[String]("mk_time"))
    assert(mk.forall(_.matches("""\d{2}:\d{2}:\d{2}""")))
  }
}
