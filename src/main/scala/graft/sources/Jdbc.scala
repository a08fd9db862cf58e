package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-source federation over JDBC (reference: tigraph/tidb reads
  * two engines — TiKV row store and TiFlash column store, `store/` —
  * behind one SQL surface; Spark's twin is one logical plan spanning
  * a JDBC relation and parquet relations). The embedded Derby driver
  * that ships with Spark backs the spec end to end: a dimension lives
  * in the RDBMS, facts live in parquet, and one query joins them with
  * filters pushed INTO the JDBC scan (`PushedFilters` on the
  * JDBCRelation — the scan ships `WHERE` to the database instead of
  * reading the table).
  *
  * Scale notes: a JDBC dimension is read once per query (optionally
  * `partitionColumn/numPartitions` for parallel reads of big tables)
  * and then broadcast like any other dim; the database never sees
  * fact-sized traffic.
  */
object Jdbc {

  // Derby writes derby.log into the CWD unless told otherwise.
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  /** Column-type overrides: Spark's Derby dialect maps StringType to
    * CLOB, which Derby refuses to compare/join on — pin every string
    * column to VARCHAR at table-creation time, at Derby's maximum
    * VARCHAR width so long text columns don't hit a truncation
    * error mid-insert. Column names are backtick-quoted — Spark parses
    * this option with its own SQL parser (then re-quotes per the JDBC
    * dialect), so an unquoted reserved word or unusual character in a
    * column name would break table creation. */
  private def varcharOverrides(df: DataFrame): String =
    df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"`${f.name}` VARCHAR(32672)")
      .mkString(", ")

  /** Publish a DataFrame as a database table (overwrite). */
  def writeTable(df: DataFrame, url: String, table: String): Unit = {
    val w = df.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val overrides = varcharOverrides(df)
    (if (overrides.nonEmpty)
      w.option("createTableColumnTypes", overrides) else w).save()
  }

  /** A lazily-read JDBC relation: filters and column pruning push
    * down to the database (visible as PushedFilters on the scan). */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
      .load()
}
