package graft

import graft.plans.RangeJoin
import org.apache.spark.sql.functions._

/** The custom broadcast range join must agree row-for-row with the
  * naive crossJoin+filter plan on adversarial interval sets
  * (overlapping, nested, duplicate, empty, null-bounded) and must
  * actually plan onto BroadcastRangeJoinExec via the
  * extensions-registered strategy.
  */
class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val probes =
    (Seq(-5L, 0L, 1L, 7L, 10L, 15L, 49L, 50L, 51L, 100L) ++
      (0L to 60L)).toDF("v")

  // Overlapping + nested + duplicate + inverted(empty) intervals.
  private lazy val intervals = Seq(
    (1, 0L, 10L), (2, 5L, 15L), (3, 8L, 9L), (4, 0L, 60L),
    (5, 50L, 50L), (6, 20L, 25L), (7, 20L, 25L), (8, 58L, 70L))
    .toDF("iid", "lo", "hi")

  private def naive = probes.crossJoin(intervals)
    .filter(col("lo") <= col("v") && col("v") < col("hi"))

  private def custom =
    RangeJoin.join(probes, intervals, col("v"), col("lo"), col("hi"))

  test("range join equals crossJoin+filter on adversarial intervals") {
    val a = custom.collect().map(_.toSeq).toSet
    val b = naive.collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("range join handles empty build side and null bounds") {
    val empty = RangeJoin.join(probes,
      intervals.filter(col("iid") > 100), col("v"), col("lo"), col("hi"))
    assert(empty.count() == 0)
    val withNulls = intervals.withColumn("lo",
      when(col("iid") === 2, lit(null).cast("long")).otherwise(col("lo")))
    val a = RangeJoin.join(probes, withNulls,
      col("v"), col("lo"), col("hi")).collect().map(_.toSeq).toSet
    val b = probes.crossJoin(withNulls)
      .filter(col("lo") <= col("v") && col("v") < col("hi"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("plans onto BroadcastRangeJoinExec, not a nested loop") {
    val p = custom.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastRangeJoin"), s"unexpected plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("mismatched probe/bound types fail at planning time") {
    val intProbes = probes.select(col("v").cast("int").as("v"))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.join(intProbes, intervals, col("v"), col("lo"), col("hi"))
    }
    assert(e.getMessage.contains("share one type"))
    val strIntervals = intervals.selectExpr(
      "iid", "CAST(lo AS STRING) lo", "CAST(hi AS STRING) hi")
    intercept[IllegalArgumentException] {
      RangeJoin.join(probes, strIntervals, col("v"), col("lo"), col("hi"))
    }
  }

  test("timestamp bounds work end-to-end (e_range_join shape)") {
    val rows = Registry.all.find(_.name == "e_range_join").get.run(t)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == t.events.count(), "every event must land in a bucket")
  }
}
