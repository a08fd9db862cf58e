package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located join path. Writing both
  * fact tables bucketed (and sorted) on their join key means the
  * sort-merge join later needs NO shuffle and NO sort: each task
  * zips bucket i with bucket i. At 100 TB this turns the dominant
  * fact⋈fact exchange into a local merge, the same effect the
  * reference gets from TiKV range-partitioned storage plus
  * MergeJoin (tidb executor/merge_join.go).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
