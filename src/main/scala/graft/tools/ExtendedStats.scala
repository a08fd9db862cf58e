package graft.tools

import scala.collection.mutable

/** Extended-statistics catalog — the CREATE / DROP STATISTICS
  * lifecycle around the cross-column objects themselves (reference:
  * parser/ast/misc.go:1702 CreateStatisticsStmt / DropStatisticsStmt;
  * statistics' extended-stats handle registers named correlation /
  * dependency objects per table and ANALYZE fills them). The store is
  * the metadata side (a driver-side catalog, the PlacementPolicies
  * shape): q_stats_lifecycle drives CREATE → ANALYZE (the real
  * q_stats_extended computation) → SHOW → DROP against it and
  * hash-pins every stage.
  *
  * Drop-while-consumed semantics (the reference's): DROP STATISTICS
  * does NOT refuse — the estimator simply stops seeing the object,
  * so the very next cardinality estimate falls back to independence.
  * That flip IS the pinned behavior (the lifecycle card computes the
  * same predicate's estimate before and after the drop); the refusal
  * corners are duplicate CREATE (ErrStatsAlreadyExists), unknown
  * DROP, and reading a never-analyzed object's value.
  */
object ExtendedStats {

  /** A registered stats object: its type ('correlation' |
    * 'dependency'), table, ordered column pair, and — once ANALYZE
    * has run — the computed value. */
  final case class StatDef(statType: String, table: String,
      cols: Seq[String], value: Option[Double] = None)

  private val stats = mutable.Map.empty[String, StatDef]

  def clear(): Unit = synchronized { stats.clear() }

  /** CREATE STATISTICS name (type) ON table(cols) — refuses a
    * duplicate name (the reference's already-exists error) and an
    * unknown stats type. */
  def create(name: String, statType: String, table: String,
      cols: Seq[String]): Unit = synchronized {
    require(statType == "correlation" || statType == "dependency",
      s"unknown extended-stats type $statType")
    require(cols.length == 2,
      s"extended statistics are cross-COLUMN objects: need 2 columns, " +
        s"got ${cols.length}")
    if (stats.contains(name)) throw new IllegalStateException(
      s"extended statistics $name already exist")
    stats(name) = StatDef(statType, table, cols)
  }

  /** DROP STATISTICS name — refuses an unknown name; an analyzed
    * value is discarded with the object (consumers fall back to
    * independence on their next estimate). */
  def drop(name: String): Unit = synchronized {
    if (stats.remove(name).isEmpty) throw new IllegalStateException(
      s"extended statistics $name do not exist")
  }

  /** ANALYZE's write-back: store the computed value for `name`.
    * Refuses an unknown name — the computation is only ever run FOR
    * a registered object. */
  def fill(name: String, value: Double): Unit = synchronized {
    val d = stats.getOrElse(name, throw new IllegalStateException(
      s"extended statistics $name do not exist"))
    stats(name) = d.copy(value = Some(value))
  }

  /** The analyzed value, or None if the object exists but ANALYZE
    * has not filled it. Throws on an unknown name (the consumer
    * asked for an object that was never created — a planner bug,
    * not a quiet independence fallback). */
  def value(name: String): Option[Double] = synchronized {
    stats.getOrElse(name, throw new IllegalStateException(
      s"extended statistics $name do not exist")).value
  }

  /** Does the object exist? (The estimator's fallback test: a
    * dropped dependency means independence.) */
  def exists(name: String): Boolean = synchronized {
    stats.contains(name)
  }

  /** SHOW STATS_EXTENDED rows — (name, type, table, columns,
    * status), name-ordered; status renders the ANALYZE state
    * (analyzed objects carry their value at 4dp). */
  def renderRows(): Seq[(String, String, String, String, String)] =
    synchronized {
      stats.toSeq.sortBy(_._1).map { case (n, d) =>
        (n, d.statType, d.table, d.cols.mkString("~"),
          d.value.map(v => "analyzed:" + String.format(
            java.util.Locale.ROOT, "%.4f", Double.box(v)))
            .getOrElse("pending"))
      }
    }
}
