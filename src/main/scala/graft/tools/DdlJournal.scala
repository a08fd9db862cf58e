package graft.tools

import scala.collection.mutable

/** ADMIN SHOW DDL JOBS store (reference: executor/executor.go:442
  * DDLJobRetriever; :466 appendJobToChunk renders one row per job —
  * job id, schema/table names, job type, schema state, row count,
  * state; ddl/ddl_worker.go runs the queue that feeds it). The
  * engine's DDL surface is warehouse-layout operations (generation
  * writes, partition exchanges, recycle-bin drops), so the journal
  * records those: driver-sized by nature, plain JVM state like
  * [[Acl]]/[[StatementsSummary]].
  *
  * Wall-clock columns (start/end time) are deliberately NOT rendered
  * by the card — job identity, ordering, type, affected table and row
  * count are the deterministic, hash-checkable facts. */
object DdlJournal {

  final case class Job(id: Long, db: String, table: String,
      jobType: String, schemaState: String, rowCount: Long,
      state: String)

  private val jobs = mutable.ArrayBuffer.empty[Job]
  private val seq = new java.util.concurrent.atomic.AtomicLong

  def clear(): Unit = synchronized { jobs.clear(); seq.set(0) }

  /** Record a finished DDL job; returns its monotonic id (the queue
    * position — TiDB's job IDs are allocator-monotonic too). */
  def record(db: String, table: String, jobType: String,
      rowCount: Long): Long = synchronized {
    val id = seq.incrementAndGet()
    jobs += Job(id, db, table, jobType, "public", rowCount, "synced")
    id
  }

  /** The history, newest-last (ADMIN SHOW DDL JOBS renders a bounded
    * recent window; the journal IS that window here). */
  def history(): Seq[Job] = synchronized { jobs.toList }
}
