package graft.sources

import org.apache.spark.sql.SparkSession

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
}
