package graft.tools

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** FLASHBACK TABLE machinery (reference: executor/ddl.go — DROP only
  * unlinks the table's metadata while the data stays readable until
  * the GC safepoint passes; FLASHBACK TABLE / RECOVER TABLE re-links
  * the retained data within that window). The dir-per-table warehouse
  * twin: DROP moves the table directory into a recycle bin entry
  * (an O(1) same-filesystem rename — no data copied, exactly the
  * unlink-not-erase semantics), FLASHBACK renames the newest retained
  * entry back, and GC makes the forgetting permanent. Entry names
  * carry a monotonic sequence so "newest" is deterministic, never a
  * file-mtime race. */
object RecycleBin {

  private val seq = new java.util.concurrent.atomic.AtomicLong

  /** DROP TABLE with retention: move `tableDir` into
    * `binDir/<name>__<seq>`; returns the bin entry path. The table
    * dir no longer exists afterwards — reads fail exactly like a
    * dropped table — but the data was renamed, not erased.
    *
    * The sequence is process-local but a bin directory OUTLIVES the
    * JVM (that's the GC-window model), so each drop first raises the
    * counter above the highest sequence already persisted in THIS
    * bin — otherwise a post-restart drop would reuse low sequences,
    * colliding with retained entries and letting flashback restore a
    * stale pre-restart entry as "newest". */
  def drop(tableDir: String, binDir: String): String = synchronized {
    // The whole list→bump→move sequence is one critical section:
    // two concurrent drops into the SAME bin must not both read the
    // persisted max before either has moved its entry, or they mint
    // the same sequence and the second ATOMIC_MOVE fails.
    val src = new File(tableDir)
    require(src.isDirectory, s"no table at $tableDir")
    Files.createDirectories(Paths.get(binDir))
    val persistedMax = Option(new File(binDir).listFiles())
      .getOrElse(Array.empty)
      .map(_.getName.split("__").last)
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .foldLeft(0L)((m, s) => math.max(m, s.toLong))
    val n = seq.updateAndGet(cur => math.max(cur, persistedMax) + 1)
    val entry = s"$binDir/${src.getName}__$n"
    Files.move(src.toPath, Paths.get(entry),
      StandardCopyOption.ATOMIC_MOVE)
    entry
  }

  /** FLASHBACK TABLE: restore the NEWEST retained bin entry for
    * `name` back to `restoreTo`. Throws when nothing is retained
    * (the reference's "table not found / GC already collected"
    * error path) or when the destination already exists (a live
    * table must not be silently clobbered). */
  def flashback(binDir: String, name: String, restoreTo: String): Unit = {
    // EXACT name match: the entry name minus its trailing __<seq>
    // must equal `name` — a prefix test would let table "t__v2"'s
    // entries shadow table "t" and restore the wrong data.
    val entries = Option(new File(binDir).listFiles()).getOrElse(Array())
      .filter(f => f.isDirectory &&
        f.getName.matches(
          java.util.regex.Pattern.quote(name) + "__\\d+"))
    if (entries.isEmpty) throw new IllegalStateException(
      s"flashback: no retained entry for $name in $binDir " +
        "(never dropped, or already GC'd)")
    val newest = entries.maxBy(_.getName.split("__").last.toLong)
    val dst = new File(restoreTo)
    if (dst.exists()) throw new IllegalStateException(
      s"flashback: destination $restoreTo already exists")
    Files.move(newest.toPath, dst.toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** GC: permanently delete every bin entry with sequence ≤
    * `safepointSeq` (the GC-safepoint analog — deterministic, no
    * wall clock). Returns the number of entries purged. */
  def gc(binDir: String, safepointSeq: Long): Int = {
    val entries = Option(new File(binDir).listFiles()).getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.contains("__"))
      .filter(_.getName.split("__").last.toLong <= safepointSeq)
    entries.foreach(e => graft.sources.Formats.deleteRecursively(e))
    entries.length
  }

  /** The current sequence high-water — pass to [[gc]] to purge
    * everything dropped so far. */
  def currentSeq: Long = seq.get()
}
