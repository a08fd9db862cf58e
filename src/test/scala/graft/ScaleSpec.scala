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

  test("runtime bloom filter prunes the fact side of a selective join") {
    // The runtime-filter story at 100 TB: a selective dim predicate
    // becomes a bloom filter evaluated INSIDE the fact scan stage, so
    // non-matching fact rows die before the shuffle (the reference's
    // analog is pushing the lookup side of IndexLookupJoin into the
    // probe — executor/index_lookup_join.go). Thresholds are tuned
    // down because the local fact side is far below the 10 GB
    // default; at cluster scale the defaults fire on their own.
    val tuned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = t.lineitem.select("l_orderkey", "l_quantity")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // Filter semantics unchanged: same rows as the plain join —
      // with the runtime filter OFF for the reference, otherwise both
      // sides get the identical injection and the check is vacuous.
      val n = j.count()
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(n ==
        t.lineitem.join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // The runtime half of the skew story: SkewJoin.salted is the
    // plan-time mitigation; AQE's skew-join rule is the zero-code
    // one — a hot key's oversized shuffle partition is split into
    // advisory-sized slices AFTER the map stage measures it, each
    // slice joining against a replicated dim partition. Thresholds
    // are tuned down so the local data trips the rule; cluster
    // defaults fire on their own at 100 TB.
    import spark.implicits._
    val tuned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // One hot key carrying ~99% of the fact rows + a uniform tail.
      val fact = spark.range(0, 60000)
        .select(when(col("id") < 59000, 0L).otherwise(col("id") % 7 + 1)
          .as("k"), col("id").as("v"))
      val dim = spark.range(0, 8).select(col("id").as("k"),
        concat(lit("payload_"), col("id")).as("p"))
      val j = fact.join(dim, "k")
      // collect() drives THIS dataset's QueryExecution (count() would
      // plan a separate one and leave j's AQE plan unfinalized).
      assert(j.collect().length == 60000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
