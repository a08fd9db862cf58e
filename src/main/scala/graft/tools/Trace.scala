package graft.tools

import graft.{Registry, Tables}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** EXPLAIN ANALYZE / TRACE analog (reference: executor/trace.go +
  * adapter.go runtime stats): execute a registry entry via its OWN
  * QueryExecution (toRdd) and report per-operator runtime metrics
  * from the FINAL adaptive plan — the plan AQE actually ran, not the
  * static estimate Explain shows. Never "simplify" this to a sink
  * write: df.write wraps the query in a separate write-command
  * QueryExecution and leaves the traced plan's metrics empty. The
  * walk descends through AdaptiveSparkPlanExec and materialized
  * query stages, so exchange-bounded subtrees aren't invisible the
  * way a naive children-walk leaves them. */
object Trace {

  /** One executed operator: node name + its numOutputRows metric
    * (None for nodes without a row counter, e.g. exchanges' reused
    * shells). */
  final case class Node(name: String, rowsOut: Option[Long])

  def run(name: String, t: Tables): Seq[Node] = {
    val df = Registry.byName(name).run(t)
    // Drive THIS DataFrame's own physical plan (toRdd), not a sink
    // write: df.write wraps the query in a separate write-command
    // QueryExecution, which would leave df.queryExecution's metrics
    // forever empty and this trace reporting zeros.
    df.queryExecution.toRdd.count()
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case o                        => o.children
    }).flatMap(walk)
    walk(df.queryExecution.executedPlan)
      .map(n => Node(n.nodeName, n.metrics.get("numOutputRows").map(_.value)))
  }
}
