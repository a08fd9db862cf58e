package graft

import org.apache.spark.sql.DataFrame

/** One engine capability = one named query + optional DuckDB oracle.
  *
  * The oracle SQL must produce identical column names and engine-
  * neutral types (BIGINT counts, DOUBLE money — see
  * [[graft.operators.Exact]]); the driver sorts columns by name and
  * rows by value before hashing.
  */
final case class Q(name: String, oracle: Option[String])(
    val run: Tables => DataFrame)

object Registry {
  /** All capability suites, in SURVEY.md §2 order. */
  def suites: Seq[Seq[Q]] = Seq(
    operators.Relational.all,
    operators.TpchMore.all,
    operators.Scalars.all,
    operators.Scalars2.all,
    operators.Analytics.all,
    operators.Wave4.all,
    operators.Wave6.all,
    operators.Wave7.all,
    operators.Wave8.all,
    operators.Wave9.all,
    operators.Wave10.all,
    operators.Wave11.all,
    operators.Wave12.all,
    operators.Wave13.all,
    operators.Wave14.all,
    operators.Wave15.all,
    operators.Wave16.all,
    operators.Wave17.all,
    operators.Wave18.all,
    operators.Wave19.all,
    operators.Wave20.all,
    operators.Wave21.all,
    operators.Wave22.all,
    operators.Dml.all,
    operators.Lookups.all,
    operators.TpchFull.all,
    graph.GraphQueries.all,
    graph.CatalogQueries.all,
    dedup.DedupQueries.all,
    ann.AnnQueries.all,
    text.TextQueries.all,
    text.RankQueries.all,
    media.MediaQueries.all,
    streaming.EventQueries.all,
  )
  lazy val all: Seq[Q] = suites.flatten

  /** Lookup-or-throw shared by the tools surface (Explain, Trace,
    * IndexAdvise): an unknown name must throw, never degrade to an
    * empty result. */
  def byName(name: String): Q = all.find(_.name == name).getOrElse(
    throw new IllegalArgumentException(s"unknown registry query: $name"))
}
