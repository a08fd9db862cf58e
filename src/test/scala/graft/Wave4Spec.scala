package graft

import org.apache.spark.sql.functions._

/** Round-4 capability checks that the DuckDB oracle cannot express:
  * CMS heavy-hitter error bounds, SHA-512 digests, collation ordering.
  */
class Wave4Spec extends SparkSpecBase {

  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  test("q_agg_heavyhitters estimates are overestimates within the eps bound") {
    // CMS guarantees est >= exact, and est <= exact + eps·N with
    // probability `confidence` (eps=0.001 per flag group). Check every
    // (flag, candidate) the query emits against exact counts.
    val est = run("q_agg_heavyhitters")
      .select(col("flag"), col("l_suppkey"), col("est")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exactRows = t.lineitem
      .groupBy(col("l_returnflag"), col("l_suppkey"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totals = t.lineitem.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty)
    est.foreach { case (key @ (flag, _), e) =>
      val exact = exactRows.getOrElse(key, 0L)
      assert(e >= exact, s"CMS underestimated $key: $e < $exact")
      val bound = exact + math.max(1L, (0.001 * totals(flag) * 10).toLong)
      assert(e <= bound, s"CMS estimate for $key way off: $e > $bound")
    }
  }

  test("q_agg_heavyhitters top-1 per flag matches the exact top-1") {
    // eps·N ≈ 0.006 per group at sf0.001 — far under the gap between
    // the true heaviest supplier and the rest, so rank-1 must agree.
    val estTop = run("q_agg_heavyhitters")
      .filter(col("rank") === 1)
      .select(col("flag"), col("l_suppkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(col("n").desc, col("l_suppkey"))
    val exactTop = t.lineitem
      .groupBy(col("l_returnflag"), col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_suppkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estTop == exactTop,
      s"sketch top-1 $estTop != exact top-1 $exactTop")
  }

  test("sha2-512 matches java.security.MessageDigest") {
    // DuckDB has no sha512, so the digest is pinned against the JDK
    // reference implementation instead of the cross-engine oracle.
    val rows = t.customer.filter(col("c_custkey") < 20)
      .select(col("c_name"),
        sha2(col("c_name").cast("binary"), 512).as("d")).collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("SHA-512")
    rows.foreach { r =>
      val expect = md.digest(r.getString(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(1) == expect, s"sha512 mismatch for ${r.getString(0)}")
    }
  }

  test("aes_encrypt produces distinct ciphertext per key and decrypts exactly") {
    val keys = Seq("0123456789abcdef", "fedcba9876543210")
    val out = t.customer.filter(col("c_custkey") < 20)
      .select(col("c_name"),
        expr(s"aes_encrypt(CAST(c_name AS BINARY), '${keys(0)}', 'ECB')")
          .as("c0"),
        expr(s"aes_encrypt(CAST(c_name AS BINARY), '${keys(1)}', 'ECB')")
          .as("c1"),
        expr(s"CAST(aes_decrypt(aes_encrypt(CAST(c_name AS BINARY), " +
          s"'${keys(0)}'), '${keys(0)}') AS STRING)").as("rt"))
      .collect()
    out.foreach { r =>
      assert(!java.util.Arrays.equals(
        r.getAs[Array[Byte]]("c0"), r.getAs[Array[Byte]]("c1")))
      assert(r.getAs[String]("rt") == r.getString(0))
    }
  }

  test("collation UTF8_LCASE ordering equals lower() ordering") {
    val mixed = t.customer.select(
      when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
        .otherwise(lower(col("c_mktsegment"))).as("seg"),
      col("c_custkey"))
    val byCollation = mixed
      .orderBy(collate(col("seg"), "UTF8_LCASE"), col("c_custkey"))
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSeq
    val byLower = mixed
      .orderBy(lower(col("seg")), col("c_custkey"))
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSeq
    assert(byCollation == byLower)
  }

  test("q_agg_topk_sketch equals the exact top-5 per flag") {
    // maxItemsTracked (1000) exceeds the per-flag supplier NDV (100),
    // so the sketch counts are exact and, after the deterministic
    // re-rank, the output must match the exact top-5 precisely.
    val sketchTop = run("q_agg_topk_sketch")
      .select(col("flag"), col("l_suppkey"), col("est"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getInt(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(col("n").desc, col("l_suppkey"))
    val exactTop = t.lineitem
      .groupBy(col("l_returnflag"), col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getInt(3))).toSet
    assert(sketchTop == exactTop)
  }

  test("q_scan_sample is seed-reproducible, in-band, and a subset") {
    val once = run("q_scan_sample")
    val again = run("q_scan_sample")
    val a = once.collect().map(_.toSeq).toSet
    assert(a == again.collect().map(_.toSeq).toSet,
      "same seed produced different samples")
    val total = t.lineitem.count().toDouble
    val frac = a.size / total
    assert(frac > 0.02 && frac < 0.09, s"sample fraction $frac off 5%")
    assert(once.join(t.lineitem,
      Seq("l_orderkey", "l_linenumber"), "left_anti").isEmpty,
      "sample contains rows not in the source")
  }

  test("streaming shard export is deterministic and idempotent per batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_shards")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val docs = t.documents.select(col("doc_id"), col("text"))
    val input = MemoryStream[(Long, String)]
    val q = graft.sources.ShardWriter.startStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", dir.toString,
      shardRows = 50, nShards = 4, checkpoint = ckpt.toString)
    try {
      input.addData(docs.as[(Long, String)].collect().toSeq.take(200))
      q.processAllAvailable()
      input.addData(docs.as[(Long, String)].collect().toSeq.drop(200))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(s"$dir/batch=*")
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() ==
      docs.select("doc_id").distinct().count())
    // Batch replay (failure recovery) rewrites the same directory
    // instead of appending: re-running batch 0's write is a no-op for
    // the total row count.
    graft.sources.ShardWriter.write(
      docs.limit(200), "doc_id", s"$dir/batch=0", 50, 4)
    assert(spark.read.parquet(s"$dir/batch=*").count() == docs.count(),
      "batch replay duplicated rows")
  }

  test("incremental dedup emits only fingerprints absent from the corpus index") {
    val out = run("d_dedup_incremental")
    val corpusFps = t.documents.filter(col("doc_id") % 10 =!= 0)
      .select(md5(graft.functions.TextFns.normalize(col("text"))
        .cast("binary")).as("fp"))
    assert(out.join(corpusFps, "fp").isEmpty,
      "incremental output contains fingerprints already in the corpus")
    // Snapshot docs whose fingerprint IS in the corpus must be absent.
    val snapSeen = t.documents.filter(col("doc_id") % 10 === 0)
      .select(md5(graft.functions.TextFns.normalize(col("text"))
        .cast("binary")).as("fp"))
      .join(corpusFps, "fp")
    assert(out.count() + snapSeen.select("fp").distinct().count() ==
      t.documents.filter(col("doc_id") % 10 === 0)
        .select(md5(graft.functions.TextFns.normalize(col("text"))
          .cast("binary"))).distinct().count())
  }
}
