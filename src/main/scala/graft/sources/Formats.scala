package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format support. The reference engine owns its storage
  * (TiKV row store / TiFlash column store); the Spark-native engine
  * instead speaks the open formats a 100 TB lake actually uses —
  * parquet (primary, pushdown + pruning), orc (same), csv/json
  * (ingest interchange). Writers partition by any column set so a
  * cluster write produces partition-pruned layouts.
  */
object Formats {

  val supported = Seq("parquet", "orc", "json", "csv")

  def write(df: DataFrame, format: String, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    require(supported.contains(format), s"unsupported sink: $format")
    val w = df.write.format(format).mode(SaveMode.Overwrite)
      .option("header", "true")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path)
  }

  def read(spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None): DataFrame = {
    require(supported.contains(format), s"unsupported source: $format")
    val r = spark.read.format(format)
      .option("header", "true").option("inferSchema", "false")
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  /** Whole-file binary ingestion (`binaryFile` source) — the real
    * entry point for multimodal corpora stored as loose files: one
    * row per file with (path, modificationTime, length, content),
    * the payload arriving as the opaque binary column the media
    * pipeline (graft.media) consumes. Files larger than
    * `spark.sql.sources.binaryFile.maxLength` fail fast instead of
    * OOMing a task; pushdown on length/path works because the
    * metadata columns come from the file listing, not the bytes. */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** Line-oriented text ingestion (one `value` column per line) —
    * raw-corpus landing format before any schema exists. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** 8-byte hex content fingerprint of a local file or directory
    * (absolute path + leaf names/sizes/mtimes). Keys /tmp caches of
    * derived layouts (partitioned copies, ANN indexes) so regenerated
    * source data — or two paths whose String.hashCode collides — get
    * distinct cache dirs instead of silently serving stale derived
    * state. */
  def contentFingerprint(path: String): String = {
    val f = new java.io.File(path)
    val leaves = (if (f.isDirectory) f.listFiles().toSeq else Seq(f))
      .map(x => s"${x.getName}:${x.length}:${x.lastModified}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"${f.getAbsolutePath}|$leaves".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }

  /** Path component safe for embedding a source path in a cache dir
    * name. The DATA IDENTITY (source dir, build params) belongs in
    * the cacheDir PREFIX — only the content fingerprint goes in the
    * suffix — so eviction never touches caches of other datasets. */
  def sanitize(path: String): String =
    path.replaceAll("[^A-Za-z0-9.]+", "-").stripPrefix("-")

  /** Cache directory `<prefix>_<fp>` for a fingerprint-keyed derived
    * layout, evicting STALE siblings first: without this, every
    * source-data regeneration leaves behind a full previous copy
    * (`<prefix>_<oldfp>`) and iterating on data generation steadily
    * fills /tmp. Anything that isn't a `<prefix>_*` sibling — e.g. a
    * same-prefix-different-params or different-dataset cache — is
    * untouched because those belong in the prefix (see sanitize). */
  def cacheDir(prefix: String, fp: String): String = {
    val p = new java.io.File(prefix)
    val (base, stem) = (p.getParentFile, p.getName)
    if (base != null && base.isDirectory) {
      Option(base.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(stem + "_") &&
          f.getName != s"${stem}_$fp")
        .foreach(deleteRecursively)
    }
    s"${prefix}_$fp"
  }

  /** Parquet read that degrades to `empty` on EXACTLY the two
    * analysis-time absent-layout conditions (missing path, dir with
    * no data files) — any other read failure (permissions, listing
    * errors) propagates, because treating it as an empty layout
    * silently breaks whatever exactly-once or novelty invariant the
    * caller built on the read. ONE spelling for every incremental
    * layout consumer (dedup/vector ingest fences, the retrain gate,
    * delta-aware probes). */
  def readParquetOr(spark: SparkSession, dir: String)(
      empty: => DataFrame): DataFrame =
    try spark.read.parquet(dir)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" ||
            e.getCondition == "UNABLE_TO_INFER_SCHEMA" => empty
    }

  /** Recursive local delete (cache-dir eviction). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
