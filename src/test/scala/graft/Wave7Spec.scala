package graft

import org.apache.spark.sql.functions._

/** Round-6 wave: DELETE/UPDATE snapshot DML, JSON_SEARCH 'all' mode,
  * GBK transcoding, timestamp-addressed time travel, delimited
  * export (oracle-checked where SQL-expressible; semantics pinned
  * here). */
class Wave7Spec extends SparkSpecBase {

  private def q(name: String) = Registry.all.find(_.name == name).get.run(t)

  test("delete: survivors violate neither the predicate nor the doomed set") {
    val survivors = q("q_delete")
    val doomed = t.orders
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(doomed.nonEmpty, "doomed set must be non-trivial")
    val rows = survivors.collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("l_quantity") >= 3)
      assert(!doomed(r.getAs[Long]("l_orderkey")))
    }
    // Exactly the complement survives: count matches a direct filter,
    // and the surviving rows are bit-identical pass-throughs.
    val expect = t.lineitem
      .filter(!(col("l_quantity") < 3) &&
        !col("l_orderkey").isin(doomed.toSeq.map(Long.box): _*))
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice")
    assert(rows.length.toLong == expect.count())
    assert(survivors.except(expect).count() == 0)
    assert(rows.length.toLong < t.lineitem.count(), "something was deleted")
  }

  test("timestamp as-of: _meta resolves T to one version dir, monotone commits") {
    val dir = operators.Wave6.timeTravelStore(t)
    val meta = spark.read.parquet(s"$dir/_meta").collect()
      .map(r => (r.getAs[Int]("version"), r.getAs[Long]("cutoff"),
        r.getAs[Long]("commit_ts_us"))).sortBy(_._1)
    assert(meta.map(_._1).sameElements(Array(0, 1, 2)))
    assert(meta.forall(_._3 > 0), "commit timestamps populated")
    assert(meta.sliding(2).forall(p => p(0)._3 <= p(1)._3),
      "commit timestamps are non-decreasing")
    // Resolution: max version whose commit ts <= T (T = v1's commit).
    val tAsOf = meta(1)._3
    val expectV = meta.filter(_._3 <= tAsOf).map(_._1).max
    val res = q("q_time_travel_ts").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vdir = spark.read.parquet(s"$dir/version=$expectV").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res == vdir)
  }

  test("delimited export: dialect is on disk, round trip is lossless") {
    val res = q("q_export_csv")
    val sel = t.customer.filter(col("c_custkey") < 500)
      .select(col("c_custkey"),
        concat(col("c_name"), lit("|\"\nx")).as("payload"),
        col("c_acctbal"))
    assert(res.count() == sel.count())
    assert(res.except(sel).count() == 0 && sel.except(res).count() == 0)
    // The files really carry the dialect: pipe delimiter and an
    // enclosed (quoted) payload with the raw line break inside.
    val dir = new java.io.File(operators.Wave7.exportDir(t))
    val part = dir.listFiles().filter(_.getName.startsWith("part-")).head
    val text = new String(
      java.nio.file.Files.readAllBytes(part.toPath), "UTF-8")
    assert(text.startsWith("c_custkey|payload|c_acctbal"))
    assert(text.contains("\"Customer#"), "payload field is enclosed")
  }

  test("delimited import: enclosure, null-on-malformed, truncated lines") {
    val rows = q("q_import_csv").collect()
    assert(rows.length == t.customer.filter(col("c_custkey") < 600).count())
    rows.foreach { r =>
      val c = r.getAs[Long]("c_custkey")
      assert(r.getAs[Long]("id") == c, "id field always parses")
      val nm = r.getAs[String]("nm")
      // Enclosed field: the embedded delimiter survives the parse.
      if (c % 5 == 0) assert(nm.endsWith(";q") && !nm.startsWith("\""))
      else assert(!nm.contains(";"))
      if (c % 11 == 0 || c % 7 == 0) {
        assert(r.isNullAt(r.fieldIndex("bal")), "malformed/short → NULL")
        assert(r.getAs[Int]("bad") == 1)
      } else {
        assert(!r.isNullAt(r.fieldIndex("bal")))
        assert(r.getAs[Int]("bad") == 0)
      }
    }
  }

  test("media dedup: reported overlaps equal recomputed frame-set jaccard") {
    val pairs = q("m_media_dedup").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Int]("common"), r.getAs[Double]("jac")))
    assert(pairs.nonEmpty, "corpus has engineered near-dups")
    // Independent recompute: per-doc sampled-frame fingerprint sets.
    val frames = media.MediaQueries.frameSample(t.documents)
      .select("doc_id", "frame_fp").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    pairs.foreach { case (a, b, common, jac) =>
      assert(a < b)
      val (fa, fb) = (frames(a), frames(b))
      assert((fa & fb).size == common)
      val expect = (fa & fb).size.toDouble / (fa | fb).size
      assert(expect >= 0.5 && math.abs(jac - math.rint(expect * 1e4) / 1e4)
        < 1e-9)
    }
  }

  test("zlib: mysql blob layout, corrupt input -> NULL, crc32 matches JVM") {
    // Kernel edge cases.
    assert(functions.Zlib.compress(Array.emptyByteArray).isEmpty)
    assert(functions.Zlib.uncompress(Array.emptyByteArray).isEmpty)
    assert(functions.Zlib.uncompress(Array[Byte](1, 2, 3)) == null)
    assert(functions.Zlib.uncompress(
      Array[Byte](10, 0, 0, 0, 1, 2, 3, 4)) == null, "bad zlib stream")
    // SQL surface (registered functions) + per-row crc32 vs the JVM
    // reference implementation.
    functions.GraftFunctions.register(spark)
    val rows = t.customer.limit(50)
      .select(col("c_name"),
        expr("decode(graft_uncompress(graft_compress(c_name)), 'UTF-8')")
          .as("rt"),
        crc32(encode(col("c_name"), "UTF-8")).as("crc"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(0), "round trip")
      val c = new java.util.zip.CRC32()
      c.update(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(2) == c.getValue)
    }
  }

  test("time-travel store degrades to base-only snapshots on empty events") {
    // A source dir whose events table has zero rows: the max-seq
    // scalar is null and every version must equal the base snapshot
    // (no NPE, no empty store).
    val dir = "/tmp/graft_tt_empty_src"
    val f = new java.io.File(dir)
    // Guard on BOTH files: a prior run that crashed between the two
    // writes (r6's broken events reader did exactly that) must not
    // leave a half-built fixture that poisons every later run.
    if (!new java.io.File(s"$dir/orders.parquet").exists() ||
        !new java.io.File(s"$dir/events.parquet").exists()) {
      f.mkdirs()
      t.orders.limit(50).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      // ts as raw nanos LONG — the layout Tables.events expects.
      t.events.filter(lit(false))
        .withColumn("ts", expr("unix_micros(ts) * 1000")).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val empt = Tables(spark, dir)
    val store = operators.Wave6.timeTravelStore(empt)
    val base = empt.orders.select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (v <- 0 until 3) {
      val snap = spark.read.parquet(s"$store/version=$v").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(snap == base, s"version $v must equal base")
    }
    val meta = spark.read.parquet(s"$store/_meta").collect()
    assert(meta.length == 3 &&
      meta.forall(_.getAs[Long]("commit_ts_us") == 0L))
  }

  test("update: both arms rewrite, row count and untouched rows preserved") {
    val updated = q("q_update")
    assert(updated.count() == t.orders.count(), "UPDATE never changes rowcount")
    val gcust = t.customer
      .join(t.nation.filter(col("n_name") === "NATION_7"),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(gcust.nonEmpty)
    val base = t.orders.select("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
      .collect().map(r => r.getLong(0) -> r).toMap
    q("q_update").collect().foreach { r =>
      val b = base(r.getAs[Long]("o_orderkey"))
      val hit = gcust(r.getAs[Long]("o_custkey"))
      // Multi-table arm.
      assert(r.getAs[String]("o_orderstatus") ==
        (if (hit) "G" else b.getAs[String]("o_orderstatus")))
      assert(r.getAs[Double]("o_totalprice") ==
        (if (hit) b.getAs[Double]("o_totalprice") * 1.1
         else b.getAs[Double]("o_totalprice")))
      // Predicate arm.
      val early = b.getAs[java.time.LocalDateTime]("o_orderdate")
        .isBefore(java.time.LocalDateTime.of(1996, 1, 1, 0, 0))
      assert(r.getAs[String]("o_orderpriority") ==
        (if (early) "5-LOW" else b.getAs[String]("o_orderpriority")))
    }
  }
}
