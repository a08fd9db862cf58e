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
}
