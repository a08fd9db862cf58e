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
  * infoschema reader renders on demand; history-table persistence is
  * one .write.parquet on [[summary]]'s output. The summary itself is
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

  /** One row per (entry, operator class): exec_count, per-exec node
    * count, CUMULATIVE output rows across execs (the sum_latency
    * shape), and the entry's summed/max wall ms repeated on each of
    * its rows (the per-digest latency columns). Also registers the
    * result as temp view `statements_summary` — the
    * information_schema read path. */
  def summary(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val local = recs.synchronized { recs.toList }
    val rows = local.groupBy(_.entry).toSeq.flatMap { case (entry, rs) =>
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
    import spark.implicits._
    val df = rows.toDF("entry", "op", "exec_count", "n_nodes",
      "rows_total", "sum_wall_ms", "max_wall_ms")
    df.createOrReplaceTempView("statements_summary")
    df
  }
}
