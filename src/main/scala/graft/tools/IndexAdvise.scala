package graft.tools

import graft.{Registry, Tables}
import graft.operators.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}

/** Workload-driven layout advisor (reference: executor/
  * index_advise.go — TiDB recommends indexes from a workload's
  * predicates; the warehouse analog recommends PHYSICAL LAYOUT:
  * bucket/cluster columns for co-partitioned joins, partition/sort
  * columns for range pruning).
  *
  * Walks the ANALYZED logical plans of the given registry entries and
  * counts, per (table, column): equality-filter references,
  * range-filter references and equi-join key references. Columns are
  * attributed to tables via the catalog's loaded schemas (the TPC-H
  * prefix convention makes names unique across tables); derived
  * columns that match no base table are — correctly — not layout
  * candidates and are skipped.
  *
  * Advice: join-dominant → BUCKET (co-partitioned joins without a
  * shuffle); range-dominant → PARTITION_SORT (file pruning on
  * min-max); equality-only → CLUSTER; anything referenced → at least
  * a stats hint. The plan WALK is driver-side metadata work, but
  * obtaining a plan constructs the entry's DataFrame, which for a
  * few entries eagerly builds /tmp layouts — hence the explicit
  * workload parameter (see [[run]]).
  */
object IndexAdvise {

  final case class ColStats(table: String, column: String,
      eqRefs: Int, rangeRefs: Int, joinRefs: Int) {
    def advice: String =
      if (joinRefs >= math.max(eqRefs, rangeRefs) && joinRefs > 0) "BUCKET"
      else if (rangeRefs > eqRefs) "PARTITION_SORT"
      else if (eqRefs > 0) "CLUSTER"
      else "STATS_ONLY"
  }

  /** Advise over an EXPLICIT workload (registry entry names). The
    * workload is deliberately not defaulted to the whole registry:
    * constructing some entries eagerly runs real jobs and /tmp
    * layout builds (MV, bloom, backup), so "advise everything" would
    * be minutes of executor work, not metadata analysis — callers
    * pick the queries whose layout question they are asking. Returns
    * one row per referenced (table, column), most-referenced
    * first. */
  def run(t: Tables, names: Seq[String]): Seq[ColStats] = {
    require(names.nonEmpty, "pass the workload's registry entry names")
    val colToTable: Map[String, String] = Catalog.tables(t).flatMap {
      case (tab, df) => df.schema.fieldNames.map(_.toLowerCase -> tab)
    }.toMap
    val qs = names.map(Registry.byName)
    val eq = collection.mutable.Map[String, Int]().withDefaultValue(0)
    val rg = collection.mutable.Map[String, Int]().withDefaultValue(0)
    val jn = collection.mutable.Map[String, Int]().withDefaultValue(0)
    // Deep attribute collection: analyzed plans wrap columns in
    // Cast/date conversions, so pattern-matching the comparison's
    // direct children misses most real predicates. A comparison with
    // exactly ONE distinct underlying column is a sargable predicate
    // on that column, whatever wrapping Catalyst added.
    def attrs(e: Expression): Seq[String] =
      e.collect { case a: AttributeReference => a.name.toLowerCase }
        .distinct
    def scanPredicate(e: Expression): Unit = e match {
      case And(l, r) => scanPredicate(l); scanPredicate(r)
      case _: EqualTo | _: EqualNullSafe | _: In | _: InSet =>
        attrs(e) match { case Seq(a) => eq(a) += 1; case _ => () }
      case _: GreaterThan | _: GreaterThanOrEqual |
           _: LessThan | _: LessThanOrEqual =>
        attrs(e) match { case Seq(a) => rg(a) += 1; case _ => () }
      case _ => ()
    }
    qs.foreach { q =>
      // A query that fails analysis contributes nothing rather than
      // aborting the advisor — but LOUDLY, so skewed advice from a
      // partially-surveyed workload is visible, not silent.
      val planOpt: Option[LogicalPlan] =
        try Some(q.run(t).queryExecution.analyzed)
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[advise] skipped ${q.name}: ${e.getMessage}")
          None
        }
      planOpt.toSeq.flatMap(p => p.collect { case n => n }).foreach {
        case Filter(cond, _) => scanPredicate(cond)
        case Join(_, _, _, Some(cond), _) =>
          cond.foreach {
            case EqualTo(l, r)
                if attrs(l).size == 1 && attrs(r).size == 1 =>
              jn(attrs(l).head) += 1; jn(attrs(r).head) += 1
            case _ => ()
          }
        case _ => ()
      }
    }
    val cols = (eq.keySet ++ rg.keySet ++ jn.keySet)
      .flatMap(c => colToTable.get(c).map(t => t -> c))
    cols.toSeq.map { case (tab, c) => ColStats(tab, c, eq(c), rg(c), jn(c)) }
      .sortBy(s => (-(s.eqRefs + s.rangeRefs + s.joinRefs), s.table, s.column))
  }

  /** The advisor's output as a DataFrame, for ad-hoc inspection. */
  def asDF(t: Tables, names: Seq[String]): DataFrame = {
    import t.spark.implicits._
    run(t, names).map(s =>
      (s.table, s.column, s.eqRefs, s.rangeRefs, s.joinRefs, s.advice))
      .toDF("table_name", "col_name", "eq_refs", "range_refs",
        "join_refs", "advice")
  }
}
