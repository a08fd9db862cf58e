package graft.tools

import scala.collection.mutable

/** Named prepared-statement store — the PREPARE / EXECUTE /
  * DEALLOCATE lifecycle (reference: executor/prepared.go
  * PrepareExec / ExecuteExec; executor/compiler.go:380
  * DeallocateStmt drops the statement from the session's prepared
  * map). q_prepare covers the parameterized-execution half (typed
  * named markers, one parse per execution); this store adds the
  * NAMED lifecycle: a statement must be prepared before EXECUTE
  * resolves it, and after DEALLOCATE the name is gone — EXECUTE and
  * a second DEALLOCATE both refuse, exactly the reference's
  * ErrPreparedStmtNotFound paths.
  */
object Prepared {

  private val stmts = mutable.Map.empty[String, String]

  def clear(): Unit = synchronized { stmts.clear() }

  /** PREPARE name FROM template. Re-preparing an existing name
    * replaces it (MySQL semantics). */
  def prepare(name: String, template: String): Unit = synchronized {
    stmts(name) = template
  }

  /** Resolve for EXECUTE — throws ErrPreparedStmtNotFound-style
    * when the name was never prepared or already deallocated. */
  def template(name: String): String = synchronized {
    stmts.getOrElse(name, throw new IllegalStateException(
      s"prepared statement $name does not exist"))
  }

  /** DEALLOCATE PREPARE name — refuses an unknown name. */
  def deallocate(name: String): Unit = synchronized {
    if (stmts.remove(name).isEmpty) throw new IllegalStateException(
      s"prepared statement $name does not exist")
  }
}
