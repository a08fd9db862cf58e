package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned fact-table layout — the single biggest scan-cost
  * lever at 100 TB (reference: tigraph/tidb prunes partitions both
  * statically and at runtime — planner/core/rule_partition_processor
  * .go, planner/core/partition_prune.go, table/tables/partition.go).
  *
  * The Spark-native twin is a warehouse layout, not an executor: facts
  * are written `partitionBy(<date bucket>)` so each partition is a
  * self-contained directory, and Catalyst then prunes in BOTH of the
  * reference's modes for free —
  *   - static pruning: a predicate on the partition column becomes a
  *     `PartitionFilters` entry on the scan and non-matching
  *     directories are never listed or read;
  *   - dynamic partition pruning: a join whose key is the partition
  *     column against a filtered dimension injects a runtime subquery
  *     (`dynamicpruning` expression) that narrows the scan to the
  *     partitions the dim side actually produces.
  *
  * Locally the layout is materialized lazily under /tmp, keyed by a
  * content fingerprint of the source parquet (regenerated testdata →
  * new copy); on a cluster this is the table's native layout and the
  * copy step disappears.
  */
object PartitionedFact {

  /** Ship-month-partitioned lineitem (partition column `shipmonth` =
    * 'yyyy-MM' of l_shipdate). Lazily written once per source-data
    * fingerprint; returns the partition-aware reader. */
  def lineitemByShipMonth(spark: SparkSession, dataDir: String): DataFrame = {
    val src = s"$dataDir/lineitem.parquet"
    val dir = Formats.cacheDir(
      s"/tmp/graft_part_lineitem_${Formats.sanitize(dataDir)}",
      Formats.contentFingerprint(src))
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      Formats.write(
        spark.read.parquet(src)
          .withColumn("shipmonth",
            date_format(col("l_shipdate"), "yyyy-MM")),
        "parquet", dir, partitionBy = Seq("shipmonth"))
    }
    spark.read.parquet(dir)
  }
}
