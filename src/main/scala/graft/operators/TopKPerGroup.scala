package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k — one implementation for the two shapes the suite
  * needs (the declarative twin of the reference's topn pushdown,
  * planner/core/rule_topn_push_down.go).
  *
  * [[native]] is a plain ranked window + filter: Spark's
  * InferWindowGroupLimit plans a partial per-partition limit BELOW
  * the shuffle (plan-asserted in PlanShapeSpec), so each map task
  * forwards at most k rows per group — right whenever a single
  * reduce task can hold one group's k winners, i.e. almost always.
  *
  * [[salted]] adds a pre-phase for groups too large or skewed for
  * one task's window sort: phase 1 ranks inside (group, salt)
  * sub-partitions and keeps k per sub-partition — ≤ k·|salts| rows
  * per group survive — phase 2 runs the true window on that bounded
  * remnant. Provably identical to the single window: a global
  * top-k row ranks ≤ k within its own salt bucket (the bucket is a
  * subset of its group), so phase 1 can never drop it.
  */
object TopKPerGroup {

  /** Ranked top-k per group; output = df's columns + `rnCol` ≤ k. */
  def native(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int, rnCol: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(rnCol, row_number().over(w)).filter(col(rnCol) <= k)
  }

  /** Salted two-phase top-k per group; `salt` is any deterministic
    * bounded expression over df's columns (e.g. `id % 32`). */
  def salted(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int, salt: Column, rnCol: String): DataFrame = {
    val w1 = Window.partitionBy(keys :+ salt: _*).orderBy(order: _*)
    val pruned = df.withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= k).drop("__rn1")
    native(pruned, keys, order, k, rnCol)
  }
}
