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
