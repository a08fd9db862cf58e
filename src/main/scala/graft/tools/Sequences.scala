package graft.tools

import scala.collection.mutable

/** Sequence-object catalog — the CREATE / ALTER SEQUENCE lifecycle
  * around the allocation arithmetic q_sequence pins (reference:
  * ddl/sequence.go; parser/ast/ddl.go AlterSequenceStmt). The store
  * is the metadata side (the PlacementPolicies / ExtendedStats
  * shape): q_alter_sequence drives CREATE → allocate → ALTER →
  * allocate against it and hash-pins both epochs.
  *
  * The semantic that makes ALTER more than a metadata edit is cache
  * invalidation: every node's leased-but-unused value block is
  * DISCARDED by an ALTER (the reference recalculates the sequence
  * round base and drops caches), so post-ALTER allocation re-leases
  * from the restarted base — epoch-2 block bases start at 0 again
  * rather than continuing epoch 1's. RESTART WITH moves the base;
  * INCREMENT BY rescales the stride; MAXVALUE + CYCLE keep the
  * wrap-to-start overflow rule. Refusal corners (duplicate CREATE,
  * unknown ALTER, zero increment, RESTART past MAXVALUE) are
  * spec-pinned in Wave22Spec.
  */
object Sequences {

  /** One sequence object's parameters. `cacheSize` counts VALUES per
    * leased block (the reference's CACHE n), independent of the
    * increment. `cycleValues` is the number of distinct values before
    * a CYCLE sequence wraps back to `start`. */
  final case class SeqDef(start: Long, increment: Long, cacheSize: Long,
      maxValue: Long, cycle: Boolean) {
    require(increment > 0, "sequence increment must be > 0 " +
      "(zero is meaningless; descending sequences are modeled separately)")
    require(maxValue >= start,
      s"sequence MAXVALUE $maxValue below START $start")
    require(cacheSize > 0, "sequence CACHE must be positive")
    def cycleValues: Long = (maxValue - start) / increment + 1L
  }

  private val seqs = mutable.Map.empty[String, SeqDef]

  def clear(): Unit = synchronized { seqs.clear() }

  /** CREATE SEQUENCE — refuses a duplicate name (the reference's
    * table-exists error class: a sequence shares the table
    * namespace). */
  def create(name: String, d: SeqDef): Unit = synchronized {
    if (seqs.contains(name)) throw new IllegalStateException(
      s"sequence $name already exists")
    seqs(name) = d
  }

  /** ALTER SEQUENCE [RESTART WITH n] [INCREMENT BY k] [MAXVALUE m]
    * — refuses an unknown name; parameter validation happens on the
    * MERGED definition (a RESTART past the surviving MAXVALUE is the
    * reference's out-of-range error). Omitted clauses keep the
    * current value. The returned definition is what subsequent
    * allocation sees; callers must treat any ALTER as discarding
    * every leased cache block. */
  def alter(name: String, restartWith: Option[Long] = None,
      increment: Option[Long] = None, maxValue: Option[Long] = None,
      cycle: Option[Boolean] = None): SeqDef = synchronized {
    val d = seqs.getOrElse(name, throw new IllegalStateException(
      s"sequence $name does not exist"))
    val merged = SeqDef(
      start = restartWith.getOrElse(d.start),
      increment = increment.getOrElse(d.increment),
      cacheSize = d.cacheSize,
      maxValue = maxValue.getOrElse(d.maxValue),
      cycle = cycle.getOrElse(d.cycle))
    seqs(name) = merged
    merged
  }

  /** The current definition — throws on an unknown name (allocation
    * against a dropped sequence is an error, never a default). */
  def params(name: String): SeqDef = synchronized {
    seqs.getOrElse(name, throw new IllegalStateException(
      s"sequence $name does not exist"))
  }

  /** SHOW CREATE SEQUENCE-style one-line render, the q_show_create
    * card spelling. */
  def render(name: String): String = synchronized {
    val d = params(name)
    s"$name:start=${d.start}:inc=${d.increment}:cache=${d.cacheSize}" +
      s":max=${d.maxValue}:${if (d.cycle) "cycle" else "nocycle"}"
  }
}
