package graft

import org.apache.spark.sql.catalyst.expressions.{Add, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
import org.apache.spark.sql.functions._

/** Optimizer rule control — the opt_rule_blacklist.go analog
  * (reference: executor/opt_rule_blacklist.go, the
  * mysql.opt_rule_blacklist table that disables named optimizer
  * rules at runtime). Spark exposes the same operational lever as
  * `spark.sql.optimizer.excludedRules`: a misfiring rewrite on a
  * production cluster is disabled by config, no redeploy. These
  * specs prove the lever actually changes the optimized plan and
  * that removing it restores the default.
  */
class OptimizerControlSpec extends SparkSpecBase {

  private val key = "spark.sql.optimizer.excludedRules"

  private def withExcluded[A](rule: String)(f: => A): A = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, rule)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("excluding ConstantFolding leaves the unevaluated expression") {
    val df = () => t.region.select((lit(20) + lit(6)).as("x"))
    val folded = df().queryExecution.optimizedPlan
      .expressions.flatMap(_.collect { case l: Literal => l })
    assert(folded.exists(_.value == 26))
    withExcluded("org.apache.spark.sql.catalyst.optimizer.ConstantFolding") {
      val adds = df().queryExecution.optimizedPlan
        .expressions.flatMap(_.collect { case a: Add => a })
      assert(adds.nonEmpty)
    }
    // restored: folding is back on
    val refolded = df().queryExecution.optimizedPlan
      .expressions.flatMap(_.collect { case a: Add => a })
    assert(refolded.isEmpty)
  }

  test("scan-pushdown control: flag strips PushedFilters, results identical") {
    // The expression-pushdown blacklist analog (reference:
    // executor/reload_expr_pushdown_blacklist.go — disable shipping a
    // specific expression class to the storage layer at runtime, with
    // results unchanged because the engine still evaluates it). The
    // Spark lever is `spark.sql.parquet.filterPushdown`. The V1
    // FileScan string renders translated filters unconditionally
    // (the conf gates the READER, invisibly), so the spec drives the
    // q_scan_filter predicate shape through the DSv2 parquet scan,
    // whose plan reflects the conf: flipping it off must empty
    // PushedFilters while the collected rows stay identical, and
    // unsetting must restore the pushdown.
    val pdKey = "spark.sql.parquet.filterPushdown"
    val v1Key = "spark.sql.sources.useV1SourceList"
    def withConf[A](key: String, v: String)(f: => A): A = {
      val old = spark.conf.getOption(key)
      spark.conf.set(key, v)
      try f finally old match {
        case Some(x) => spark.conf.set(key, x)
        case None => spark.conf.unset(key)
      }
    }
    withConf(v1Key, "") {
      val q = () => spark.read.parquet(s"${t.dir}/lineitem.parquet")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 24)
        .select("l_orderkey", "l_quantity", "l_discount")
      def pushedLine(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString.linesIterator
          .find(_.contains("PushedFilters")).getOrElse("")
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      val onLine = pushedLine(q())
      assert(onLine.contains("l_discount"),
        s"expected a pushed discount predicate, got: $onLine")
      val baseline = rows(q())
      assert(baseline.nonEmpty)
      withConf(pdKey, "false") {
        val offLine = pushedLine(q())
        assert(offLine.contains("PushedFilters: []"),
          s"pushdown still active under $pdKey=false: $offLine")
        assert(rows(q()) == baseline,
          "results drifted when scan pushdown was disabled")
      }
      // Restored on unset: the predicate ships to the scan again.
      assert(pushedLine(q()).contains("l_discount"))
    }
  }

  test("excluding EliminateOuterJoin keeps the null-filtered outer join") {
    // A null-intolerant predicate on the right side lets the
    // optimizer degrade LEFT OUTER to INNER — the exact class of
    // rewrite an operator would blacklist when it misfires.
    val df = () => {
      val o = t.orders
      val c = t.customer
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .filter(col("c_acctbal") > 0)
    }
    def joinTypes(plan: org.apache.spark.sql.catalyst.plans
        .logical.LogicalPlan): Seq[String] = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.joinType.toString
    }
    assert(joinTypes(df().queryExecution.optimizedPlan) == Seq("Inner"))
    withExcluded(
      "org.apache.spark.sql.catalyst.optimizer.EliminateOuterJoin") {
      assert(joinTypes(df().queryExecution.optimizedPlan) ==
        Seq("LeftOuter"))
    }
  }

  test("parquet AGGREGATE pushdown: count/min/max answered from footers") {
    // The TiKV-coprocessor-aggregation analog (tidb pushes partial
    // aggregates into the storage layer; Spark's lever is the DSv2
    // parquet reader's statistics pushdown): a bare count/min/max
    // never scans data pages — the scan node itself answers from
    // row-group footers, and the plan says so via PushedAggregation.
    // At 100 TB this is the difference between a metadata pass and a
    // full-table read for the most common audit queries.
    def withConf[A](key: String, v: String)(f: => A): A = {
      val old = spark.conf.getOption(key)
      spark.conf.set(key, v)
      try f finally old match {
        case Some(x) => spark.conf.set(key, x)
        case None => spark.conf.unset(key)
      }
    }
    def q() = spark.read.parquet(s"${t.dir}/orders.parquet")
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
        max(col("o_orderkey")).as("mx"))
    val baseline = q().head()
    withConf("spark.sql.sources.useV1SourceList", "") {
      withConf("spark.sql.parquet.aggregatePushdown", "true") {
        val plan = q().queryExecution.executedPlan.toString
        assert(plan.contains("PushedAggregation") &&
          plan.contains("COUNT(*)") && plan.contains("MIN(o_orderkey)"),
          s"aggregates did not reach the scan:\n$plan")
        assert(q().head() == baseline,
          "footer-answered aggregates must equal the scanned ones")
      }
    }
  }
}
