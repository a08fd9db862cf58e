package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame

/** STATEMENTS_SUMMARY analog (reference: util/stmtsummary feeding
  * infoschema/tables.go:154 TableStatementsSummary, plus the
  * executor/slow_query.go render path): every executed statement
  * leaves a queryable per-digest record — exec count, cumulative and
  * max latency, and per-operator output-row totals — so production
  * debugging is a TABLE SCAN over history, not a re-run.
  *
  * Here the "digest" is the registry entry name, and the
  * per-operator runtime stats come from [[Trace]] (the final
  * adaptive plan's numOutputRows metrics). record() executes the
  * entry once and folds its trace into the in-memory summary —
  * the reference's stmtsummary is likewise an in-memory ring the
  * infoschema reader renders on demand; [[persistRotate]] rotates
  * the live window into on-disk history the way the reference's
  * history table keeps expired windows queryable, [[history]] folds
  * the batches back, and [[slowView]] is the slow_query.go
  * threshold filter over it. The summary itself is
  * O(entries × operator classes) — driver-sized by construction, so
  * building the DataFrame from local rows is not a collect of data.
  */
object StatementsSummary {

  private final case class Rec(entry: String, wallMs: Double,
      nodes: Seq[Trace.Node])

  private val recs = scala.collection.mutable.ArrayBuffer.empty[Rec]

  def clear(): Unit = recs.synchronized { recs.clear() }

  /** Execute registry entry `name` once, timing it, and fold its
    * per-operator trace into the summary. Returns the wall ms. */
  def record(name: String, t: Tables): Double = {
    val start = System.nanoTime()
    val nodes = Trace.run(name, t)
    val wallMs = (System.nanoTime() - start) / 1e6
    recs.synchronized { recs += Rec(name, wallMs, nodes) }
    wallMs
  }

  private def localRows: Seq[(String, String, Long, Long, Long,
      Double, Double)] = {
    val local = recs.synchronized { recs.toList }
    local.groupBy(_.entry).toSeq.flatMap { case (entry, rs) =>
      val execCount = rs.size.toLong
      val sumWall = rs.map(_.wallMs).sum
      val maxWall = rs.map(_.wallMs).max
      rs.flatMap(_.nodes).groupBy(_.name).toSeq.map { case (op, ns) =>
        (entry, op, execCount,
          // nodes of this class per execution: plans are normally
          // stable across re-runs at fixed data, but AQE may add or
          // drop a node (ReusedExchange, coalesced stages) between
          // runs — report the max observed in any single execution
          // rather than a silently-flooring average.
          rs.map(_.nodes.count(_.name == op)).max.toLong,
          ns.flatMap(_.rowsOut).sum,
          math.round(sumWall * 100) / 100.0,
          math.round(maxWall * 100) / 100.0)
      }
    }.sortBy(r => (r._1, r._2))
  }

  /** One row per (entry, operator class): exec_count, per-exec node
    * count, CUMULATIVE output rows across execs (the sum_latency
    * shape), and the entry's summed/max wall ms repeated on each of
    * its rows (the per-digest latency columns). Also registers the
    * result as temp view `statements_summary` — the
    * information_schema read path. */
  def summary(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val df = localRows.toDF("entry", "op", "exec_count", "n_nodes",
      "rows_total", "sum_wall_ms", "max_wall_ms")
    df.createOrReplaceTempView("statements_summary")
    df
  }

  /** Rotate the current in-memory window into the on-disk history
    * under `dir` and CLEAR the window — the stmtsummary history
    * contract (infoschema/tables.go:155 tableStatementsSummaryHistory
    * keeps rotated windows queryable after the live window resets;
    * executor/slow_query.go is the same persist-then-scan idea).
    * Each batch lands at `dir/batch_id=<key>` where the key is an
    * MD5 over the window's DETERMINISTIC columns (entry, op,
    * exec_count, n_nodes, rows_total) — wall times vary per run, so
    * content-keying on the stable columns makes re-recording the same
    * pinned workload overwrite its own batch instead of duplicating
    * history (the q_slow_history entry stays idempotent). Content
    * keying is deliberately LOSSY for repeated real windows: two
    * genuinely distinct windows recording identical workloads collapse
    * into one batch. When that is not wanted, pass a caller-supplied
    * `windowId` (e.g. a wall-clock bucket or monotonic counter) — it
    * is mixed into the key, so distinct windows keep distinct batches
    * while a re-record of the SAME window id stays idempotent.
    * Returns the batch key. The window snapshot is driver-sized
    * (entries × operator classes), so the write is one tiny parquet
    * file. */
  def persistRotate(spark: org.apache.spark.sql.SparkSession,
      dir: String, windowId: Option[String] = None): String = {
    val rows = localRows
    // The "b" prefix keeps the key non-numeric: batch_id is a
    // PARTITION column on read, and Spark's partition-type inference
    // would parse an all-digit hex key (leading zeros included) as
    // LONG/DOUBLE, silently mangling it before any string compare.
    val key = "b" + java.security.MessageDigest.getInstance("MD5")
      .digest((windowId.toSeq ++
          rows.map(r => s"${r._1}|${r._2}|${r._3}|${r._4}|${r._5}"))
        .mkString("\n").getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    import spark.implicits._
    rows.toDF("entry", "op", "exec_count", "n_nodes",
        "rows_total", "sum_wall_ms", "max_wall_ms")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/batch_id=$key")
    clear()
    key
  }

  /** The folded history table: every rotated batch under `dir` read
    * back and aggregated per (entry, op) — exec_count and row/time
    * totals SUM across batches, max latency is the max over
    * batches, n_batches counts the windows that saw the digest.
    * Registered as temp view `statements_summary_history`. */
  def history(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(dir)
      .groupBy("entry", "op")
      .agg(sum("exec_count").cast("long").as("exec_count"),
        max("n_nodes").cast("long").as("n_nodes"),
        sum("rows_total").cast("long").as("rows_total"),
        round(sum("sum_wall_ms"), 2).as("sum_wall_ms"),
        round(max("max_wall_ms"), 2).as("max_wall_ms"),
        countDistinct("batch_id").cast("long").as("n_batches"))
    df.createOrReplaceTempView("statements_summary_history")
    df
  }

  /** METRICS_SCHEMA analog (reference: executor/metrics_reader.go:52
    * MetricRetriever — the metrics tables render PromQL range queries
    * as per-time-bucket rows; infoschema/metric_table_def.go defines
    * the per-metric table shapes). The honest Spark-native source of
    * truth is the persisted statements history: each rotated batch IS
    * one time window, so the series render is (window_id, entry,
    * metric, value) — exec/rows/latency per window — derived by
    * folding each batch's per-op rows to entry grain (exec_count is
    * entry-level repeated per op → max; rows_total sums across the
    * entry's operator classes; wall columns are entry-level repeated
    * → max) and unpivoting the four metrics with a codegen'd stack().
    * Registered as temp view `metrics_schema`. Driver-sized by
    * construction: windows × entries × 4. */
  def metricsSeries(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(dir)
      .groupBy("batch_id", "entry")
      .agg(max("exec_count").as("exec_count"),
        sum("rows_total").as("rows_total"),
        max("sum_wall_ms").as("sum_wall_ms"),
        max("max_wall_ms").as("max_wall_ms"))
    val df = base.select(col("batch_id").cast("string").as("window_id"),
      col("entry"),
      expr("""stack(4,
          'exec_count',  CAST(exec_count  AS DOUBLE),
          'rows_total',  CAST(rows_total  AS DOUBLE),
          'sum_wall_ms', CAST(sum_wall_ms AS DOUBLE),
          'max_wall_ms', CAST(max_wall_ms AS DOUBLE))
        AS (metric, value)"""))
    df.createOrReplaceTempView("metrics_schema")
    df
  }

  /** SLOW_QUERY analog (executor/slow_query.go renders the slow log
    * as a threshold-filtered queryable table — tidb_slow_log_threshold
    * semantics): history digests whose worst recorded execution met
    * or exceeded `thresholdMs`. Registered as temp view
    * `slow_queries`. */
  def slowView(spark: org.apache.spark.sql.SparkSession, dir: String,
      thresholdMs: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = history(spark, dir)
      .filter(col("max_wall_ms") >= thresholdMs)
    df.createOrReplaceTempView("slow_queries")
    df
  }
}
