package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CostMode, FormattedMode}

/** Cost-annotated EXPLAIN surface (reference: TiDB's EXPLAIN rows
  * carry estRows/cost from its stats-driven planner,
  * planner/core/stats.go). Spark's twin is explain's COST mode: the
  * optimized logical plan annotated per-operator with
  * `Statistics(sizeInBytes=…, rowCount=…)` — rowCount appears once
  * ANALYZE'd stats (sources.Stats) + CBO propagate through the plan,
  * which is how a user audits WHY a join broadcast or reordered.
  */
object Explain {

  /** Optimized logical plan with per-operator size/rowCount
    * estimates. */
  def cost(df: DataFrame): String =
    df.queryExecution.explainString(CostMode)

  /** The physical plan in the structured per-operator format (codegen
    * ids, PushedFilters, ReadSchema). */
  def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)
}
