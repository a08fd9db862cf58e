package graft.tools

import scala.collection.mutable

/** Pessimistic row-lock registry — the SELECT ... FOR UPDATE /
  * LOCK IN SHARE MODE analog (reference: executor/executor.go:881
  * SelectLockExec — "locks every row key from source Executor…the
  * keys are buffered in transaction…If there is any key already
  * locked by another transaction, the transaction will rollback and
  * retry"). The store keeps per-(table, key) lock state: at most one
  * EXCLUSIVE owner, or any number of SHARED owners; acquisition is
  * NOWAIT all-or-nothing (a statement that hits any conflicting key
  * acquires nothing — the rollback-and-retry unit is the statement).
  *
  * Memory contract: keys are buffered per transaction exactly as
  * SelectLockExec buffers `e.keys` in the txn — bounded by the
  * locking statement's selectivity, never by table size; commit
  * (or rollback) releases the buffer.
  */
object RowLocks {

  // (table, key) -> exclusive owner
  private val excl = mutable.Map.empty[(String, Long), String]
  // (table, key) -> shared owners
  private val shared = mutable.Map.empty[(String, Long), mutable.Set[String]]

  def clear(): Unit = synchronized { excl.clear(); shared.clear() }

  /** NOWAIT acquire of `keys` on `table` for `txn`. Exclusive mode
    * conflicts with any OTHER owner (exclusive or shared); shared
    * mode conflicts only with another txn's exclusive. A txn's own
    * locks never conflict (re-lock / S→X upgrade by the sole holder
    * succeeds). Returns (acquired, conflicts): all-or-nothing, so
    * one of the two is always zero. */
  def acquire(txn: String, table: String, keys: Seq[Long],
      exclusive: Boolean): (Long, Long) = synchronized {
    // A statement's key list may repeat a key (a non-unique scan
    // emits the same row key per matching index entry); the lock
    // unit is the KEY, so dedupe at entry — otherwise acquired/
    // conflict totals double-count what held() reports once.
    val ks = keys.distinct
    val conflicts = ks.count { k =>
      val kk = (table, k)
      val otherX = excl.get(kk).exists(_ != txn)
      val otherS = (shared.getOrElse(kk, mutable.Set.empty) - txn).nonEmpty
      if (exclusive) otherX || otherS else otherX
    }
    if (conflicts > 0) (0L, conflicts.toLong)
    else {
      ks.foreach { k =>
        val kk = (table, k)
        if (exclusive) { excl(kk) = txn; shared.get(kk).foreach(_ -= txn) }
        // S on a key the txn already holds X on is a no-op: the
        // stronger lock subsumes it (and registering both would
        // double-count the key in held()).
        else if (!excl.get(kk).contains(txn))
          shared.getOrElseUpdate(kk, mutable.Set.empty) += txn
      }
      (ks.size.toLong, 0L)
    }
  }

  /** COMMIT / ROLLBACK: release every lock `txn` holds — the
    * buffered keys go to KV (or nowhere) and the locks drop either
    * way. */
  def commit(txn: String): Unit = synchronized {
    excl.filterInPlace { case (_, owner) => owner != txn }
    shared.values.foreach(_ -= txn)
    shared.filterInPlace { case (_, owners) => owners.nonEmpty }
  }

  /** SelectLockExec's `e.keys` buffer under the shared KeyBatchCap
    * contract (operators/IndexLookup.KeyBatchCap — the ONE spelling
    * of "driver-side key batches stop being defensible here"):
    * collect at most `cap` keys; past the cap the statement ABORTS
    * loudly. Unlike the index-lookup path there is NO degrade
    * fallback — locking fewer keys than the predicate selected
    * would leave rows unprotected, so the faithful analog of the
    * reference's memory-quota kill on an oversized pessimistic
    * statement is an error, not a quieter plan. */
  def collectKeys(df: org.apache.spark.sql.DataFrame, keyCol: String,
      cap: Int = graft.operators.IndexLookup.KeyBatchCap): Seq[Long] = {
    import org.apache.spark.sql.functions.col
    // The quota meters what acquire() will LOCK: distinct non-null
    // keys. A non-unique scan emitting the same row key per index
    // entry must not trip the cap on raw row count (acquire dedups
    // at entry), and a NULL "key" is no row at all — SelectLockExec
    // locks handles, which are never null.
    // Key handles are BIGINT in the store; an INT key column must
    // widen here, not ClassCastException at getLong below. ONLY
    // integral types widen — casting a decimal/string key would
    // silently truncate (or null out) and lock the WRONG key, the
    // exact fewer-keys-than-selected outcome this function's
    // contract says must abort loudly.
    // Catalyst simpleString spellings (TINYINT renders "tinyint",
    // not the Scala name "byte") — the set must match what
    // DataType.simpleString actually produces or the two narrow
    // integral widths would always fail the require.
    val integral = Set("tinyint", "smallint", "int", "bigint")
    val kt = df.schema(keyCol).dataType.simpleString
    require(integral(kt),
      s"row-lock key column $keyCol must be an integral type " +
        s"(got $kt): key handles are BIGINT row ids")
    val rows = df.select(col(keyCol).cast("long").as(keyCol))
      .where(col(keyCol).isNotNull)
      .distinct().limit(cap + 1).collect()
    require(rows.length <= cap,
      s"SELECT ... FOR UPDATE selects more than $cap keys — the " +
        "lock-buffer quota would be exceeded; narrow the predicate")
    rows.map(_.getLong(0)).toSeq
  }

  /** ADMIN CLEANUP TABLE LOCK (reference: parser/ast/ddl.go:1812
    * CleanupTableLockStmt; the janitor leg of LOCK TABLES): evict
    * every TABLE-scope sentinel (the `TABLE:` keys q_lock_tables
    * acquires) whose owner is NOT in `live` — the recovery path for
    * locks a crashed session left behind. Row locks are untouched
    * even for dead owners: their cleanup is transaction recovery,
    * not this statement. Returns the number of evicted
    * (table, owner) sentinel pairs. */
  def cleanupTableLocks(live: Set[String]): Long = synchronized {
    def tableScope(k: (String, Long)) = k._1.startsWith("TABLE:")
    var n = 0L
    excl.filterInPlace { case (k, owner) =>
      val evict = tableScope(k) && !live(owner)
      if (evict) n += 1
      !evict
    }
    shared.foreach { case (k, owners) =>
      if (tableScope(k)) {
        val dead = owners.toSet.diff(live)
        n += dead.size
        owners --= dead
      }
    }
    shared.filterInPlace { case (_, owners) => owners.nonEmpty }
    n
  }

  /** Held-lock count for a txn (spec surface). */
  def held(txn: String): Long = synchronized {
    excl.count(_._2 == txn).toLong +
      shared.count(_._2.contains(txn)).toLong
  }
}
