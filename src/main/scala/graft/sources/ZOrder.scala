package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) layout: bit-interleave two key columns and
  * range-partition + sort the data by the interleaved value, so each
  * output file covers a small square-ish region of the 2-D key space
  * instead of a thin full-width stripe. A reader pruning on BOTH
  * columns' min-max footer stats (parquet row groups, or file-level
  * partition metadata) then touches only the files whose rectangle
  * intersects the query box — the multi-dimensional generalization
  * of the single-column clustered layout.
  *
  * Reference analog: TiDB clusters a table by ONE primary-key order
  * (tablecodec row-key encoding) and any secondary predicate needs
  * its own index (index_merge_reader.go unions them); a columnar
  * warehouse gets the same multi-predicate locality from the layout
  * itself. ZOrderSpec measures it: for a 2-D box over a z-ordered
  * lineitem, a stats-pruning reader touches strictly fewer files
  * than over the single-column-sorted layout.
  *
  * Scale: the z-value is pure per-row bit arithmetic (codegen'd
  * shifts/ors — no UDF), and the layout write is one
  * repartitionByRange shuffle, the same cost as any sorted write.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integral columns: result bit 2i = bit i of `a`, bit 2i+1 =
    * bit i of `b`. 16+16 bits cover key cardinalities to 65k per
    * dimension; wider keys get range-bucketed to 16 bits first
    * (`bucketed`). */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Scale an arbitrary non-negative integral column into [0, 2^bits)
    * by linear bucketing over a known max. Values above `maxVal`
    * clamp to the top bucket — without the clamp they would exceed
    * the bit budget and `zvalue` (which reads only bits 0..bits-1)
    * would alias them onto the SMALLEST key region, silently
    * destroying the layout's locality for stale or estimated maxima. */
  def bucketed(c: Column, maxVal: Long, bits: Int = 16): Column =
    (least(c.cast("long"), lit(maxVal)) * ((1L << bits) - 1) / maxVal)
      .cast("long")

  /** Write `df` z-ordered by (a, b) into `nFiles` range-partitioned
    * sorted files under `dir`. */
  def write(df: DataFrame, a: Column, b: Column, dir: String,
      nFiles: Int): Unit =
    df.withColumn("_zv", zvalue(a, b))
      .repartitionByRange(nFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zv")
      .write.mode("overwrite").parquet(dir)

  /** Files a min-max-stats reader must touch for the box
    * `[aLo, aHi] × [bLo, bHi]`: those whose per-file [min, max]
    * ranges of BOTH columns intersect the box. This is exactly the
    * skipping decision parquet footer stats / file-level metadata
    * enable, computed from the layout itself. */
  def filesTouched(layout: DataFrame, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long =
    layout
      .groupBy(input_file_name().as("f"))
      .agg(min(col(aCol)).as("a_min"), max(col(aCol)).as("a_max"),
        min(col(bCol)).as("b_min"), max(col(bCol)).as("b_max"))
      .filter(col("a_max") >= aLo && col("a_min") <= aHi &&
        col("b_max") >= bLo && col("b_min") <= bHi)
      .count()
}
