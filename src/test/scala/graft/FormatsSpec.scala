package graft

import graft.sources.Formats
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Round-trip every supported source/sink format and check both row
  * counts and values survive, plus partitioned layout pruning.
  */
class FormatsSpec extends SparkSpecBase {

  private lazy val sample = t.orders
    .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      col("o_orderstatus"))
    .filter(col("o_orderkey") < 500)

  for (fmt <- Formats.supported) {
    test(s"$fmt round-trip preserves rows and values") {
      val dir = Files.createTempDirectory(s"graft_$fmt").toString
      Formats.write(sample, fmt, dir)
      val back = Formats.read(spark, fmt, dir, Some(sample.schema))
      assert(back.count() == sample.count())
      val a = sample.orderBy("o_orderkey").collect().map(_.toSeq)
      val b = back.orderBy("o_orderkey").collect().map(_.toSeq)
      assert(a.sameElements(b), s"$fmt values changed in round-trip")
    }
  }

  test("binaryFile source ingests whole files as opaque payloads") {
    // The real multimodal landing path: loose media files become
    // (path, mtime, length, content) rows; the payload column is the
    // binary the media pipeline consumes. Glob pushdown keeps the
    // listing (not the bytes) doing the filtering.
    val dir = Files.createTempDirectory("graft_bin")
    val payloads = Map("a.img" -> Array[Byte](1, 2, 3, -1),
      "b.img" -> Array[Byte](9, 8), "skip.txt" -> Array[Byte](0))
    payloads.foreach { case (name, bytes) =>
      Files.write(dir.resolve(name), bytes) }
    val df = Formats.readBinaryFiles(spark, dir.toString, Some("*.img"))
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val rows = df.select(col("path"), col("length"), col("content"))
      .collect().map(r => (r.getString(0).split('/').last,
        r.getLong(1), r.getAs[Array[Byte]](2))).toSeq
    assert(rows.map(_._1).toSet == Set("a.img", "b.img"))
    rows.foreach { case (name, len, content) =>
      assert(len == payloads(name).length.toLong)
      assert(java.util.Arrays.equals(content, payloads(name)))
    }
  }

  test("text source lands raw lines as a single value column") {
    val dir = Files.createTempDirectory("graft_txt")
    Files.write(dir.resolve("corpus.txt"),
      "first line\nsecond line\n".getBytes("UTF-8"))
    val df = Formats.readText(spark, dir.toString)
    assert(df.columns.toSeq == Seq("value"))
    assert(df.orderBy("value").collect().map(_.getString(0)).toSeq ==
      Seq("first line", "second line"))
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = Files.createTempDirectory("graft_part").toString
    Formats.write(sample, "parquet", dir, partitionBy = Seq("o_orderstatus"))
    val pruned = Formats.read(spark, "parquet", dir)
      .filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      sample.filter(col("o_orderstatus") === "F").count())
    assert(plan.contains("PartitionFilters") || plan.contains("o_orderstatus"),
      s"no partition pruning visible in:\n$plan")
  }
}
