package graft.graph

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One declared edge table: label + SOURCE KEY / DESTINATION KEY
  * references into vertex tables, plus arbitrary property columns.
  *
  * Reference anchors: parser/ast/ddl.go:535-543 (`SOURCE KEY
  * REFERENCES` / `DESTINATION KEY REFERENCES` column options),
  * ddl/db_test.go:7662 (friend1/friend2 — MULTIPLE typed edge tables
  * over one vertex table, friend2 carrying `description varchar,
  * start timestamp` properties), executor/write_test.go:4265
  * (per-edge-table inserts and property reads).
  *
  * `edges` always has `src` and `dst` first; every other column is an
  * edge property addressable in MATCH predicates.
  */
final case class EdgeDecl(label: String, source: String,
    destination: String, edges: DataFrame)

/** Declared property-graph catalog: named vertex tables (each with a
  * `vertex_id` key column — the implicit handle the reference exposes,
  * executor/write_test.go:4257 `where vertex_id = 1`) and named edge
  * tables. MATCH resolves each hop's edge table BY LABEL, exactly as
  * the reference planner does (planner/core/logical_plan_builder.go:
  * 6567 buildGraphPathSimple; :6619 resolves `edge.Edge.Name` per hop,
  * then the destination vertex table from the edge's EdgeOptions).
  *
  * Spark-first translation: a hop is a keyed equi-join of the bound
  * path frame against the CHOSEN edge table (never a union of all
  * edge types), with per-element predicates applied BEFORE the join —
  * the prefix-pruning rule chain selectivity depends on. Work per hop
  * is Σ deg over the pruned frontier, co-partitioned on the join key,
  * so the shape survives 100× edge tables unchanged.
  */
final case class GraphCatalog(vertexTables: Map[String, DataFrame],
    edgeTables: Map[String, EdgeDecl]) {

  def vertex(name: String): DataFrame =
    vertexTables.getOrElse(name, throw new IllegalArgumentException(
      s"unknown vertex table: $name (have ${vertexTables.keys.toSeq.sorted.mkString(", ")})"))

  def edge(label: String): EdgeDecl =
    edgeTables.getOrElse(label, throw new IllegalArgumentException(
      s"unknown edge table: $label (have ${edgeTables.keys.toSeq.sorted.mkString(", ")})"))

  /** Anchor a path at a vertex table: `match (person as a where p)`.
    * Every column of the bound frame is prefixed `<alias>_`, so later
    * hops and the final projection address `a_vertex_id`, `k_since`,
    * `c_acctbal` the way the reference addresses `s1.age`. */
  def from(table: String, alias: String, where: Column = lit(true)): PathMatch = {
    val v = vertex(table)
    val bound = v.select(v.columns.map(c => col(c).as(s"${alias}_$c")): _*)
      .filter(where)
    new PathMatch(this, bound, s"${alias}_vertex_id")
  }
}

/** A partially-bound MATCH path. Immutable: each `out` returns a new
  * state with the edge + destination vertex columns appended. */
final class PathMatch private[graph] (cat: GraphCatalog,
    val frame: DataFrame, lastKey: String) {

  /** One `.out(<edgeTable> as e where ep).(<destVertex> as v where vp)`
    * hop (reference syntax: parser/parser_test.go:6512
    * `match (students as s1).out(student_of).out(face_to_face).(person as p)`).
    * The edge table is selected BY LABEL; its declared destination
    * vertex table binds the new vertex variable. Both predicates are
    * applied to their own input BEFORE the joins. */
  def out(label: String, edgeAlias: String, edgeWhere: Column,
      destAlias: String, destWhere: Column = lit(true)): PathMatch = {
    val d = cat.edge(label)
    val e = d.edges
      .select(d.edges.columns.map(c => col(c).as(s"${edgeAlias}_$c")): _*)
      .filter(edgeWhere)
    val hopped = frame.join(e, col(lastKey) === col(s"${edgeAlias}_src"))
    val v = cat.vertex(d.destination)
    val bound = v.select(v.columns.map(c => col(c).as(s"${destAlias}_$c")): _*)
      .filter(destWhere)
    val out = hopped.join(bound,
      col(s"${edgeAlias}_dst") === col(s"${destAlias}_vertex_id"))
    new PathMatch(cat, out, s"${destAlias}_vertex_id")
  }

  /** One `.in(<edgeTable> as e where ep).(<srcVertex> as v where vp)`
    * hop — the IN direction (reference: parser/ast/graph.go:76
    * GraphEdgeDirectionIn; the planner resolves the SAME edge table
    * and flips which end binds). The bound frame's key joins the
    * edge's `dst`, and the NEW variable binds the edge's declared
    * SOURCE vertex table: "who invited me", not "whom I invited".
    * Identical keyed-equi-join shape to [[out]] — co-partitioned on
    * the join key, never |E|². */
  def in(label: String, edgeAlias: String, edgeWhere: Column,
      srcAlias: String, srcWhere: Column = lit(true)): PathMatch = {
    val d = cat.edge(label)
    val e = d.edges
      .select(d.edges.columns.map(c => col(c).as(s"${edgeAlias}_$c")): _*)
      .filter(edgeWhere)
    val hopped = frame.join(e, col(lastKey) === col(s"${edgeAlias}_dst"))
    val v = cat.vertex(d.source)
    val bound = v.select(v.columns.map(c => col(c).as(s"${srcAlias}_$c")): _*)
      .filter(srcWhere)
    val out = hopped.join(bound,
      col(s"${edgeAlias}_src") === col(s"${srcAlias}_vertex_id"))
    new PathMatch(cat, out, s"${srcAlias}_vertex_id")
  }

  /** One UNDIRECTED hop — `a -[e]- b` (reference:
    * parser/ast/graph.go:78 GraphEdgeDirectionBoth; the kernel twin
    * is g_catalog_reach's symmetrized BFS). An undirected edge
    * pattern matches each edge row ONCE whichever way it points:
    * the OUT arm binds edges leaving the frame, the IN arm edges
    * entering it, and a self-loop (src = dst) — which would fire
    * both arms with the identical binding — is kept only on the OUT
    * arm. Both arms are the same keyed equi-joins as [[out]]/[[in]];
    * the union doubles candidate edges, never |E|². The new vertex
    * variable binds the edge's OTHER end, resolved per arm from the
    * edge declaration. */
  def both(label: String, edgeAlias: String, edgeWhere: Column,
      otherAlias: String, otherWhere: Column = lit(true)): PathMatch = {
    val d = cat.edge(label)
    require(d.source == d.destination,
      s"both-direction hop over '$label' needs one vertex table on " +
        s"both ends (got ${d.source} -> ${d.destination})")
    val outArm = out(label, edgeAlias, edgeWhere, otherAlias, otherWhere)
    val inArm = in(label, edgeAlias,
      edgeWhere && col(s"${edgeAlias}_src") =!= col(s"${edgeAlias}_dst"),
      otherAlias, otherWhere)
    new PathMatch(cat,
      outArm.frame.unionByName(inArm.frame
        .select(outArm.frame.columns.map(col): _*)),
      s"${otherAlias}_vertex_id")
  }
}

object GraphCatalog {

  /** The declared catalog over the test warehouse — the Spark analog
    * of ddl/db_test.go:7662's `people1` + `friend1`/`friend2` DDL:
    * one vertex table (`person`, keyed by customer key) and TWO
    * heterogeneous property-carrying edge tables derived
    * deterministically from orders, so a DuckDB oracle can rebuild
    * them cell-for-cell:
    *
    *  - `knows(src, dst, since DATE, strength BIGINT)` — the friend2
    *    analog (`description varchar, start timestamp` there);
    *  - `invited(src, dst, amount DOUBLE, prio VARCHAR)` — a second
    *    edge type with a DIFFERENT property set, so per-label
    *    selection is observable.
    *
    * Destination keys are folded into the contiguous 1..max(custkey)
    * vertex domain, so every edge endpoint resolves. Both edge tables
    * group to one row per (src, dst) — the reference's edge identity.
    */
  def declared(t: Tables): GraphCatalog = {
    val person = t.customer.select(
      col("c_custkey").as("vertex_id"), col("c_name").as("name"),
      col("c_nationkey").as("nation"), col("c_acctbal").as("acctbal"))
    // A SECOND vertex type: edges may reference different source and
    // destination tables (the reference resolves each end from the
    // edge's own EdgeOptions — logical_plan_builder.go:6639).
    val product = t.part.select(
      col("p_partkey").as("vertex_id"), col("p_name").as("name"),
      col("p_brand").as("brand"), col("p_size").as("size"),
      col("p_retailprice").as("price"))
    // person -> product purchases, one row per (customer, part) with
    // aggregate properties — the heterogeneous-endpoint edge table.
    val bought = t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("src"), col("l_partkey").as("dst"))
      .agg(sum(col("l_quantity")).as("qty"),
        max(col("l_extendedprice")).as("price"))
    val mx = t.customer.agg(max(col("c_custkey")).as("m"))
    val knows = t.orders.crossJoin(broadcast(mx))
      .select(col("o_custkey").as("src"),
        (lit(1) + (col("o_custkey") * 13 + col("o_orderkey")) % col("m")).as("dst"),
        col("o_orderdate"), (col("o_orderkey") % 100).as("s"))
      .groupBy("src", "dst")
      .agg(min(col("o_orderdate")).cast("date").as("since"),
        max(col("s")).as("strength"))
    val invited = t.orders.crossJoin(broadcast(mx))
      .select(
        (lit(1) + (col("o_custkey") * 7 + col("o_orderkey") * 3) % col("m")).as("src"),
        col("o_custkey").as("dst"),
        col("o_totalprice"), col("o_orderpriority"))
      .groupBy("src", "dst")
      .agg(max(col("o_totalprice")).as("amount"),
        min(col("o_orderpriority")).as("prio"))
    GraphCatalog(
      vertexTables = Map("person" -> person, "product" -> product),
      edgeTables = Map(
        "knows" -> EdgeDecl("knows", "person", "person", knows),
        "invited" -> EdgeDecl("invited", "person", "person", invited),
        "bought" -> EdgeDecl("bought", "person", "product", bought)))
  }

  /** The catalog's construction as DuckDB CTEs — prepended to every
    * oracle so the declared tables exist on both sides cell-for-cell. */
  val oracleCtes: String = """
    WITH mx AS (SELECT MAX(c_custkey) AS m FROM customer),
    person AS (
      SELECT c_custkey AS vertex_id, c_name AS name,
             c_nationkey AS nation, c_acctbal AS acctbal
      FROM customer),
    knows AS (
      SELECT o_custkey AS src,
             1 + (o_custkey * 13 + o_orderkey) % m AS dst,
             CAST(MIN(o_orderdate) AS DATE) AS since,
             MAX(o_orderkey % 100) AS strength
      FROM orders, mx GROUP BY 1, 2),
    invited AS (
      SELECT 1 + (o_custkey * 7 + o_orderkey * 3) % m AS src,
             o_custkey AS dst,
             MAX(o_totalprice) AS amount,
             MIN(o_orderpriority) AS prio
      FROM orders, mx GROUP BY 1, 2),
    product AS (
      SELECT p_partkey AS vertex_id, p_name AS name, p_brand AS brand,
             p_size AS size, p_retailprice AS price
      FROM part),
    bought AS (
      SELECT o_custkey AS src, l_partkey AS dst,
             SUM(l_quantity) AS qty, MAX(l_extendedprice) AS price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2)"""
}
