package graft.sources

import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}

/** Stats-driven planning (reference: TiDB's collected statistics and
  * cost-based planner — /root/reference/statistics/histogram.go,
  * planner/core/stats.go). The Spark twin is `ANALYZE TABLE` +
  * `spark.sql.cbo.enabled`: collected row counts and column
  * histograms let Catalyst size FILTERED relations from data, so a
  * dimension that only *becomes* broadcast-sized after its predicate
  * gets a BroadcastHashJoin without a hand-placed `broadcast()` hint.
  *
  * Policy at 100 TB (the reason hints alone don't survive scale-up):
  * a hand-placed hint is an unconditional promise — when the hinted
  * table grows past executor memory the broadcast build OOMs. The
  * durable setup is
  *   1. ANALYZE the dimension tables (cheap: dims are small) after
  *      each load — `analyze` below;
  *   2. leave join strategy to CBO + AQE: CBO picks the initial plan
  *      from stats, AQE re-plans at runtime from OBSERVED sizes
  *      (including demoting a broadcast that stats mispredicted);
  *   3. reserve explicit `broadcast()` for relations whose size is
  *      invariant by construction (nation/region-class tables).
  * CboSpec asserts the stats-driven broadcast decision end to end.
  */
object Stats {

  /** Collect table-level and (optionally) column-level statistics for
    * a catalog table. Column histograms are what make predicate
    * selectivity estimates real — without them CBO falls back to
    * fixed selectivities. */
  def analyze(spark: SparkSession, table: String,
      cols: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (cols.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS " +
        s"FOR COLUMNS ${cols.mkString(", ")}")
  }

  /** DUMP the collected statistics of a catalog table to a flat
    * key=value artifact — the per-table half of the PlanReplayer
    * bundle, but complete: size, row count, and every column stat
    * (ndv, min/max, null count, lengths, histogram) in Spark's own
    * CatalogColumnStat.toMap property encoding, so [[load]] can
    * rebuild them losslessly. Reference: the stats file a PLAN
    * REPLAYER bundle carries (executor/plan_replayer.go) that
    * LOAD STATS later ingests. */
  def dump(spark: SparkSession, table: String, file: String): Unit = {
    val meta = GraftSqlShim.sessionCatalog(spark)
      .getTableMetadata(TableIdentifier(table))
    val stats = meta.stats.getOrElse(throw new IllegalStateException(
      s"no statistics collected for $table — run analyze first"))
    val props = new java.util.Properties
    props.setProperty("sizeInBytes", stats.sizeInBytes.toString)
    stats.rowCount.foreach(rc =>
      props.setProperty("rowCount", rc.toString))
    props.setProperty("columns", stats.colStats.keys.toSeq.sorted
      .mkString(","))
    for ((c, cs) <- stats.colStats; (k, v) <- cs.toMap(c))
      props.setProperty(s"col.$k", v)
    val out = new java.io.FileOutputStream(file)
    try props.store(out, s"graft stats dump: $table")
    finally out.close()
  }

  /** LOAD STATS (reference: executor/load_stats.go:32 LoadStatsExec —
    * inject statistics from a dumped artifact instead of re-running
    * ANALYZE; the restore leg of the PlanReplayer bundle). Rebuilds
    * CatalogStatistics from [[dump]]'s artifact and writes it through
    * the SAME catalog call AnalyzeTableCommand uses, so the CBO sees
    * stats-from-file exactly as it would see stats-from-ANALYZE —
    * LoadStatsSpec plan-asserts the identical broadcast flip with no
    * ANALYZE in the session. The point at 100 TB: ANALYZE on a huge
    * fact is a full scan; shipping the stats artifact with the data
    * (or from a replayer bundle) makes a fresh cluster plan correctly
    * in O(artifact) time. */
  def load(spark: SparkSession, table: String, file: String): Unit = {
    val props = new java.util.Properties
    val in = new java.io.FileInputStream(file)
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    val colProps = props.stringPropertyNames().asScala
      .filter(_.startsWith("col."))
      .map(k => k.stripPrefix("col.") -> props.getProperty(k)).toMap
    val cols = Option(props.getProperty("columns")).getOrElse("")
      .split(",").toSeq.filter(_.nonEmpty)
    val colStats = cols.flatMap(c =>
      CatalogColumnStat.fromMap(table, c, colProps).map(c -> _)).toMap
    val stats = CatalogStatistics(
      BigInt(props.getProperty("sizeInBytes")),
      Option(props.getProperty("rowCount")).map(BigInt(_)),
      colStats)
    GraftSqlShim.sessionCatalog(spark)
      .alterTableStats(TableIdentifier(table), Some(stats))
    // Cached plans (and the relation cache) captured the stats-less
    // relation — refresh so the next plan reads the injected stats.
    spark.catalog.refreshTable(table)
  }
}
