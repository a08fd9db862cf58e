package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase DISTRIBUTED prefix sum — the scale-safe replacement for
  * a single global ORDER BY window (one task at 100 TB): (1) a
  * per-range partial via a PARTITIONed window, (2) range TOTALS —
  * one row per range, thousands not billions — prefix-summed in the
  * tiny second phase and broadcast back. Shared by q_id_assign
  * (gapless row ids), t_pack (token offsets) and t_shuffle
  * (permutation positions) so the subtle parts — the 1-PRECEDING
  * frame, the coalesce-to-0 first row, the broadcast join-back —
  * exist once.
  *
  * The global order is (rangeCol, orderCols...); rangeCol must be a
  * RANGE bucket of that order (equal ranges ⇒ contiguous), e.g.
  * `doc_id div 100` for doc_id order.
  */
object PrefixSum {

  /** Adds `out` = Σ `valueCol` over all rows strictly before this row
    * in (rangeCol, orderCols) order. */
  def sumBefore(df: DataFrame, rangeCol: String, orderCols: Seq[String],
      valueCol: String, out: String): DataFrame = {
    val intraW = Window.partitionBy(rangeCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = df.withColumn("_intra",
      coalesce(sum(col(valueCol)).over(intraW), lit(0L)))
    intra.join(broadcast(rangeOffsets(df, rangeCol, sum(col(valueCol)))),
        rangeCol)
      .withColumn(out, col("_off") + col("_intra"))
      .drop("_intra", "_off")
  }

  /** Adds `out` = number of rows strictly before this row in
    * (rangeCol, orderCols) order — the gapless global ordinal. */
  def rowNumberBefore(df: DataFrame, rangeCol: String,
      orderCols: Seq[String], out: String): DataFrame = {
    val intraW = Window.partitionBy(rangeCol)
      .orderBy(orderCols.map(col): _*)
    val intra = df.withColumn("_intra",
      (row_number().over(intraW) - 1).cast("long"))
    intra.join(broadcast(rangeOffsets(df, rangeCol, count(lit(1)))), rangeCol)
      .withColumn(out, col("_off") + col("_intra"))
      .drop("_intra", "_off")
  }

  /** Adds `out` = number of rows strictly before this row WITHIN its
    * `groupCol` group, in (rangeCol, orderCols) order — the per-group
    * dense ordinal. The naive spelling is
    * `Window.partitionBy(groupCol)`, which caps parallelism at
    * |groups| (16 shards, 4 sessions) no matter the cluster size;
    * here phase 1 partitions by (group, range) — parallelism scales
    * with the DATA — and phase 2 prefix-sums the per-(group, range)
    * totals inside each group, a |groups|·|ranges|-row table. Used by
    * q_auto_random (per-shard id sequence) and q_sequence (per-session
    * block offsets). */
  def rowNumberBeforeBy(df: DataFrame, groupCol: String, rangeCol: String,
      orderCols: Seq[String], out: String): DataFrame = {
    val intraW = Window.partitionBy(groupCol, rangeCol)
      .orderBy(orderCols.map(col): _*)
    val intra = df.withColumn("_intra",
      (row_number().over(intraW) - 1).cast("long"))
    intra.join(
        broadcast(rangeOffsets(df, rangeCol, count(lit(1)), Seq(groupCol))),
        Seq(groupCol, rangeCol))
      .withColumn(out, col("_off") + col("_intra"))
      .drop("_intra", "_off")
  }

  /** Phase 2: per-(group, range) totals prefix-summed within each
    * group — |groups|·|ranges| rows, so the per-group window here is
    * over the tiny totals table, not the data. With no group keys the
    * single-partition window is likewise totals-sized. */
  private def rangeOffsets(df: DataFrame, rangeCol: String,
      total: org.apache.spark.sql.Column,
      groupCols: Seq[String] = Nil): DataFrame = {
    val totalsW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(rangeCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keys = groupCols :+ rangeCol
    df.groupBy(keys.map(col): _*).agg(total.as("_cnt"))
      .withColumn("_off", coalesce(sum(col("_cnt")).over(totalsW), lit(0L)))
      .select(keys.map(col) :+ col("_off"): _*)
  }
}
