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

  /** Always repartitions on the bucket key first: repartition's hash
    * IS the bucket hash (both `pmod(murmur3, n)` — the identity that
    * makes bucketed joins shuffle-free), so task i holds exactly
    * bucket i and every bucket lands as ONE file. Single-file buckets
    * are what lets the scan expose the sortBy order as plan
    * `outputOrdering` (Spark re-verifies one-file-per-bucket before
    * trusting it, under the legacy.bucketedTableScan.outputOrdering
    * conf the session builders set) — the zero-Sort merge-join path. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Bucket count of the lazily-built co-located pair below. */
  val PairBuckets = 8

  /** Lazily-built co-located (orders, customer) pair, both bucketed
    * AND per-bucket sorted on the customer key with ONE file per
    * bucket (the repartition before the write guarantees it) — the
    * layout under the index-lookup MERGE join: Spark's bucketed scan
    * only exposes the files' sort order as plan `outputOrdering` when
    * each bucket is a single file, and that is what lets a downstream
    * SMJ run with ZERO Exchange and ZERO Sort. Keyed by the source
    * data fingerprint (regenerated testdata → rebuilt tables); within
    * a session the catalog check makes every call after the first
    * free. */
  /** The pair's registered table names — the ONE spelling shared
    * with q_show_index, which lists the backing warehouse
    * directories to derive the bucket-file counts. The key
    * fingerprints BOTH sources: a regenerated customer.parquet with
    * byte-identical orders must still rebuild. Table names must be
    * bare SQL identifiers: [A-Za-z0-9_] only. */
  def pairTableNames(dataDir: String): (String, String) = {
    val fp = Formats.contentFingerprint(s"$dataDir/orders.parquet") +
      Formats.contentFingerprint(s"$dataDir/customer.parquet")
    val dirTag = Formats.sanitize(dataDir).replaceAll("[^A-Za-z0-9_]", "_")
    val suffix = s"${dirTag}_$fp".replaceAll("[^A-Za-z0-9_]", "_")
    (s"graft_b_orders_$suffix", s"graft_b_customer_$suffix")
  }

  def ordersCustomerBucketed(spark: SparkSession,
      dataDir: String): (DataFrame, DataFrame) = {
    val dirTag = Formats.sanitize(dataDir).replaceAll("[^A-Za-z0-9_]", "_")
    val (oTbl, cTbl) = pairTableNames(dataDir)
    if (!spark.catalog.tableExists(oTbl) ||
        !spark.catalog.tableExists(cTbl)) {
      // Evict only THIS dataDir's generations: stale-fingerprint
      // siblings plus current-suffix orphans (the session catalog is
      // in-memory, so a fresh JVM sees orphaned directories from the
      // previous one, and saveAsTable refuses to adopt an existing
      // location). Pairs built for OTHER data dirs — possibly live in
      // this very session's catalog — are never touched.
      val wh = new java.io.File(java.net.URI.create(
        spark.conf.get("spark.sql.warehouse.dir")).getPath)
      // Full-name match pins the EXACT dirTag: the table name is
      // graft_b_<tbl>_<dirTag>_<16-hex-fp>, so requiring the suffix
      // after the tag to be pure hex rejects both a tag that merely
      // prefixes another (sf1 vs sf10) AND a tag this one extends
      // with an underscore segment (data_x vs data_x_0, whose
      // remainder '0_<fp>' is not hex) — either would otherwise have
      // its live, catalog-registered tables deleted.
      // (pure-hex, any length: the pair fingerprint concatenates both
      // sources' 16-hex digests)
      val mine = java.util.regex.Pattern.compile(
        s"graft_b_(orders|customer)_${java.util.regex.Pattern.quote(dirTag)}_[0-9a-f]+")
      Option(wh.listFiles()).getOrElse(Array.empty)
        .filter(f => mine.matcher(f.getName).matches())
        .foreach(Formats.deleteRecursively)
      writeBucketed(spark.read.parquet(s"$dataDir/orders.parquet"),
        oTbl, "o_custkey", PairBuckets)
      writeBucketed(spark.read.parquet(s"$dataDir/customer.parquet"),
        cTbl, "c_custkey", PairBuckets)
    }
    (spark.table(oTbl), spark.table(cTbl))
  }
}
