package graft

import graft.operators.SkewJoin
import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Scale-path mechanics: salted skew joins return identical results
  * to plain joins; bucketed tables join with zero shuffle.
  */
class ScaleSpec extends SparkSpecBase {

  test("salted join result equals the plain shuffle join") {
    val li = t.lineitem.select("l_orderkey", "l_linenumber", "l_quantity")
    val o = t.orders.select(col("o_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.salted(li, o, "l_orderkey", "o_orderkey",
        "l_linenumber", buckets = 8)
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(plain.length > 0 && plain.sameElements(salted))
  }

  test("bucketed tables sort-merge join without a shuffle") {
    for (tbl <- Seq("orders_bucketed", "customer_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"/tmp/graft_warehouse/$tbl")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete())
        loc.delete()
      }
    }
    Bucketing.writeBucketed(
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_bucketed", "o_custkey", buckets = 8)
    Bucketing.writeBucketed(
      t.customer.select("c_custkey", "c_nationkey"),
      "customer_bucketed", "c_custkey", buckets = 8)
    val joined = Bucketing.table(spark, "orders_bucketed").hint("merge")
      .join(Bucketing.table(spark, "customer_bucketed").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    val expected = t.orders.join(t.customer,
      col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == expected)
  }
}
