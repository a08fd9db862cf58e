package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** The session manager behind SHOW PROCESSLIST and KILL (reference:
  * util/processinfo.go:33 ProcessInfo + :165 SessionManager.
  * ShowProcessList; executor/show.go:388 fetchShowProcessList;
  * executor/simple.go:1455 executeKillStmt → SessionManager.Kill).
  *
  * Each connection is one registered row: id, user, host, db, the
  * command class, state, and the live statement text (Info). The
  * render applies the reference's privilege rule (show.go:404):
  * with the PROCESS privilege you see ALL threads, without it only
  * your own. Status counters (executor/show.go:765 fetchShowStatus's
  * variable.GetStatusVars surface) accumulate on the same object —
  * connections opened, questions asked, per-command counts, rows
  * sent — so SHOW STATUS reads the workload the processlist ran.
  *
  * The registry is driver-sized by construction (one record per open
  * connection) and synchronized: worker threads driving concurrent
  * statements register/deregister against the same store the render
  * reads — which is exactly what makes the spec's mid-flight
  * snapshot and kill legs honest.
  *
  * KILL: each connection's statements run under the Spark job group
  * `conn-<id>` (set thread-locally by the session's worker thread);
  * [[kill]] cancels that job group — Spark's cancelJobGroup is the
  * exact analog of SessionManager.Kill interrupting the victim's
  * executors — and marks the connection dead so it leaves the
  * processlist.
  */
object SessionManager {

  final case class Proc(id: Long, user: String, host: String,
      db: String, var command: String, var state: String,
      var info: Option[String], var rowsSent: Long)

  private val procs = mutable.LinkedHashMap.empty[Long, Proc]
  private val counters = mutable.LinkedHashMap.empty[String, Long]
  private var nextId = 0L
  // Bumped on every clear() so job-group names never repeat across
  // registry generations: Spark's status tracker remembers COMPLETED
  // jobs, and a reused group name would let a poll-until-active kill
  // loop match a stale job from a previous generation.
  private var epoch = 0L

  def clear(): Unit = synchronized {
    procs.clear(); counters.clear(); nextId = 0L; epoch += 1
  }

  private def bump(k: String, by: Long = 1L): Unit =
    counters(k) = counters.getOrElse(k, 0L) + by

  /** Open a connection: registers a Sleep row, counts Connections. */
  def connect(user: String, host: String, db: String): Long =
    synchronized {
      nextId += 1
      procs(nextId) = Proc(nextId, user, host, db, "Sleep", "", None,
        0L)
      bump("Connections")
      nextId
    }

  /** The job group a connection's statements run under — the handle
    * [[kill]] cancels. Worker threads call
    * `spark.sparkContext.setJobGroup(jobGroup(id), sql, true)`.
    * Epoch-qualified so a cleared-and-reused connection id never
    * aliases a finished generation's jobs. */
  def jobGroup(id: Long): String = synchronized { s"conn-$epoch-$id" }

  /** Statement start: flips the row to Query/executing with the live
    * SQL text, counts Questions + the per-command class counter
    * (Com_select, Com_show, ...). */
  def begin(id: Long, sql: String, comClass: String = "Com_select"): Unit =
    synchronized {
      // A killed connection was removed from the registry, so a
      // statement on it fails here as unknown — the MySQL "gone
      // away" analog.
      val p = procs.getOrElse(id,
        throw new IllegalArgumentException(s"unknown connection $id"))
      p.command = "Query"; p.state = "executing"; p.info = Some(sql)
      bump("Questions"); bump(comClass)
    }

  /** Statement end: back to Sleep, Info clears (the reference's
    * Sleep rows render NULL Info), result size accumulates. */
  def finish(id: Long, rowsSent: Long = 0L): Unit = synchronized {
    // A statement finishing on a connection KILL already removed
    // counts nothing: the rows were never delivered to a live
    // client, and the global counter must agree with the
    // per-connection bookkeeping.
    procs.get(id).foreach { p =>
      p.command = "Sleep"; p.state = ""; p.info = None
      p.rowsSent += rowsSent
      bump("Rows_sent", rowsSent)
    }
  }

  def disconnect(id: Long): Unit = synchronized { procs -= id }

  /** KILL CONNECTION <id> (executor/simple.go:1455 → sm.Kill):
    * cancels the connection's Spark job group — every active job the
    * victim statement submitted dies with a cancellation error on
    * the victim's thread — and removes the row. Returns true when
    * the id existed. */
  def kill(spark: SparkSession, id: Long): Boolean = synchronized {
    procs.get(id) match {
      case Some(_) =>
        spark.sparkContext.cancelJobGroup(jobGroup(id))
        procs -= id
        bump("Com_kill")
        true
      case None => false
    }
  }

  /** KILL QUERY <id> (the reference's `s.Query` leg of
    * executeKillStmt — sm.Kill(connID, query=true)): cancels the
    * connection's CURRENT statement but KEEPS the connection alive —
    * the row flips back to Sleep and the next statement on the same
    * id is accepted. Contrast [[kill]] (KILL CONNECTION), which
    * removes the row and rejects further statements. */
  def killQuery(spark: SparkSession, id: Long): Boolean = synchronized {
    procs.get(id) match {
      case Some(p) =>
        spark.sparkContext.cancelJobGroup(jobGroup(id))
        p.command = "Sleep"; p.state = ""; p.info = None
        bump("Com_kill")
        true
      case None => false
    }
  }

  /** FLUSH STATUS (executor/simple.go executeFlush, ast.FlushStatus):
    * resets the resettable statement counters to zero; open
    * connections, their gauges, and Connections (MySQL's
    * non-resettable cumulative connection count) survive. */
  def flushStatus(): Unit = synchronized {
    counters.filterInPlace { case (k, _) => k == "Connections" }
  }

  /** SHOW [FULL] PROCESSLIST rendered for `asUser` (show.go:388):
    * with the PROCESS privilege every row, without it only the
    * caller's own. Non-full truncates Info to 100 chars (the
    * reference's %.100v). Row order = connection id. */
  def show(asUser: String, asHost: String, full: Boolean = true)
      : Seq[(Long, String, String, String, String, String, Option[String])] =
    synchronized {
      val all = Acl.verify(asUser, asHost, "*", "*", "PROCESS")
      procs.values.toSeq
        .filter(p => all || p.user == asUser)
        .sortBy(_.id)
        .map { p =>
          val info = p.info.map(s => if (full) s else s.take(100))
          (p.id, p.user, p.host, p.db, p.command, p.state, info)
        }
    }

  /** SHOW STATUS (show.go:765): the accumulated counters plus the
    * live gauges — threads connected (open rows) and running
    * (currently executing). Deterministic: no wall-clock rows
    * (Uptime is the reference's only clock row; excluded from the
    * rendered card and documented there). */
  def status(): Seq[(String, String)] = synchronized {
    val gauges = Seq(
      "Threads_connected" -> procs.size.toLong,
      "Threads_running" -> procs.values.count(_.state == "executing").toLong,
      "Slow_queries" -> counters.getOrElse("Slow_queries", 0L))
    (counters.toSeq ++ gauges.filterNot(g => counters.contains(g._1)))
      .sortBy(_._1)
      .map { case (k, v) => (k, v.toString) }
  }
}
