package graft

import graft.graph.GraphCatalog
import org.apache.spark.sql.functions._

/** The declared graph catalog (typed vertex/edge tables — the Spark
  * analog of ddl/db_test.go:7662's people1 + friend1/friend2 DDL):
  * per-edge-table selection, property schemas, referential closure,
  * and keyed-join-only MATCH plans. */
class GraphCatalogSpec extends SparkSpecBase {

  private lazy val cat = GraphCatalog.declared(t)

  test("two heterogeneous edge tables with distinct property schemas") {
    val knows = cat.edge("knows")
    val invited = cat.edge("invited")
    assert(knows.source == "person" && knows.destination == "person")
    assert(invited.source == "person" && invited.destination == "person")
    assert(knows.edges.columns.toSeq == Seq("src", "dst", "since", "strength"))
    assert(invited.edges.columns.toSeq == Seq("src", "dst", "amount", "prio"))
  }

  test("unknown vertex/edge table names throw, never degrade") {
    intercept[IllegalArgumentException](cat.edge("friend9"))
    intercept[IllegalArgumentException](cat.vertex("people9"))
  }

  test("edge endpoints resolve inside their DECLARED vertex tables") {
    for (label <- cat.edgeTables.keys.toSeq.sorted) {
      val d = cat.edge(label)
      val srcDangling = d.edges.select(col("src").as("vertex_id"))
        .join(cat.vertex(d.source).select("vertex_id"),
          Seq("vertex_id"), "left_anti").count()
      val dstDangling = d.edges.select(col("dst").as("vertex_id"))
        .join(cat.vertex(d.destination).select("vertex_id"),
          Seq("vertex_id"), "left_anti").count()
      assert(srcDangling == 0 && dstDangling == 0,
        s"$label dangling: src=$srcDangling dst=$dstDangling")
    }
  }

  test("one edge row per (src, dst) — the reference's edge identity") {
    for (label <- cat.edgeTables.keys.toSeq.sorted) {
      val e = cat.edge(label).edges
      assert(e.count() == e.select("src", "dst").distinct().count(), label)
    }
  }

  test("heterogeneous hop binds the edge's declared destination table") {
    val d = cat.edge("bought")
    assert(d.source == "person" && d.destination == "product")
    val hop = cat.from("person", "a", col("a_vertex_id") <= 50)
      .out("bought", "b", lit(true), "p")
      .frame
    // Destination variable carries PRODUCT properties, not person's.
    assert(hop.columns.contains("p_brand") &&
      hop.columns.contains("p_size") && !hop.columns.contains("p_nation"))
    assert(hop.count() > 0)
  }

  test("MATCH selects edge tables BY LABEL: same anchor, different hop") {
    val srcs = cat.vertex("person").filter(col("vertex_id") <= 20)
    val overKnows = cat.from("person", "a", col("a_vertex_id") <= 20)
      .out("knows", "k", lit(true), "b")
      .frame.select(col("a_vertex_id"), col("b_vertex_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overInvited = cat.from("person", "a", col("a_vertex_id") <= 20)
      .out("invited", "i", lit(true), "b")
      .frame.select(col("a_vertex_id"), col("b_vertex_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(overKnows.nonEmpty && overInvited.nonEmpty)
    assert(overKnows != overInvited,
      "traversing a different edge table must bind different neighbors")
    // Each hop reproduces its own edge table exactly — no leakage
    // from the other label.
    val rawKnows = cat.edge("knows").edges.filter(col("src") <= 20)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(overKnows == rawKnows)
    assert(srcs.count() > 0)
  }

  test("edge-property predicate prunes the chosen table only") {
    val strong = cat.from("person", "a", col("a_vertex_id") <= 100)
      .out("knows", "k", col("k_strength") >= 90, "b")
      .frame
    val rows = strong.select("k_strength").collect().map(_.getLong(0))
    assert(rows.nonEmpty && rows.forall(_ >= 90))
  }

  test("weighted catalog PageRank: floor respected, weights load-bearing") {
    val pr = Registry.byName("g_catalog_pagerank").run(t)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.nonEmpty)
    // Teleport floor: nobody falls below 0.15 (a no-in-edge vertex
    // sits exactly on it).
    assert(pr.values.forall(_ >= 0.15 - 1e-9))
    val noIn = {
      val e = cat.edge("knows").edges
      val dsts = e.select("dst").collect().map(_.getLong(0)).toSet
      pr.keySet -- dsts
    }
    noIn.foreach(n => assert(math.abs(pr(n) - 0.15) < 1e-9,
      s"vertex $n has no in-edges but rank ${pr(n)}"))
    // Weights are load-bearing: flattening them to 1 changes ranks.
    val e1 = cat.edge("knows").edges
      .select(col("src"), col("dst"), lit(1.0).as("w"))
    val nodes = e1.select(col("src").as("node"))
      .union(e1.select(col("dst").as("node"))).distinct()
    val ew = e1.join(e1.groupBy(col("src").as("d_node"))
        .agg(sum(col("w")).as("wsum")), col("src") === col("d_node"))
      .select(col("src"), col("dst"), col("w"), col("wsum"))
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to 6) {
      val contrib = ranks.join(ew, col("node") === col("src"))
        .select(col("dst").as("cn"),
          (col("rank") * col("w") / col("wsum")).as("c"))
        .groupBy("cn").agg(sum(col("c")).as("c"))
      ranks = nodes.join(contrib, col("node") === col("cn"), "left")
        .select(col("node"), (lit(0.15) + lit(0.85) *
          coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    val flat = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keys.exists(n => math.abs(pr(n) - flat(n)) > 1e-6),
      "weighted ranks must differ from the flat-weight ranks")
  }

  test("typed-chain MATCH plan is keyed joins only — no cartesian") {
    val plan = GraphCatalog.declared(t)
      .from("person", "a", col("a_nation") < 5)
      .out("knows", "k", col("k_strength") > 50, "b")
      .out("invited", "i", col("i_amount") > 150000, "c")
      .frame.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // The only nested-loop join allowed is the 1-row broadcast of the
    // max-custkey scalar that folds destination keys into the vertex
    // domain.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 2, s"expected only the scalar broadcasts, got $bnlj")
  }

  test("IN-direction hop: plan is keyed joins only, and the hop " +
    "really flips orientation") {
    val cat = GraphCatalog.declared(t)
    val frame = cat
      .from("person", "a", col("a_nation") < 5)
      .in("invited", "i", col("i_amount") > 150000, "b")
      .frame
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 2, s"expected only the scalar broadcasts, got $bnlj")
    // Orientation: every bound row joins a's key on the edge's DST
    // and the inviter variable on the edge's SRC.
    frame.select("a_vertex_id", "i_src", "i_dst", "b_vertex_id")
      .limit(200).collect().foreach { r =>
        assert(r.getLong(2) == r.getLong(0), s"dst != anchor: $r")
        assert(r.getLong(1) == r.getLong(3), s"src != inviter: $r")
      }
    // The IN hop is the exact transpose of the OUT hop over the same
    // pruned edge table: identical (anchor, inviter) pair sets.
    val out = cat.from("person", "b2")
      .out("invited", "i", col("i_amount") > 150000,
        "a2", col("a2_nation") < 5)
      .frame.select(col("a2_vertex_id").as("a"),
        col("b2_vertex_id").as("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val inn = frame.select(col("a_vertex_id").as("a"),
        col("b_vertex_id").as("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(inn == out, "IN hop must transpose the OUT hop")
  }

  test("BOTH-direction hop: self-loops bind once, plan stays keyed, " +
    "and the frame equals out + in-minus-selfloops") {
    val cat = GraphCatalog.declared(t)
    val frame = cat.from("person", "a", col("a_nation") < 3)
      .both("knows", "k", col("k_strength") > 90, "b").frame
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("a_vertex_id", "k_src", "k_dst", "b_vertex_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    val out = cat.from("person", "a", col("a_nation") < 3)
      .out("knows", "k", col("k_strength") > 90, "b").frame
    val in = cat.from("person", "a", col("a_nation") < 3)
      .in("knows", "k", col("k_strength") > 90 &&
        col("k_src") =!= col("k_dst"), "b").frame
    assert(pairs(frame) == (pairs(out) ++ pairs(in)).sorted)
    // Self-loops (src = dst surviving the prune) bind ONCE — they
    // are kept only on the OUT arm, so the both-frame's loop
    // multiset equals the OUT arm's exactly (parallel self-loop
    // edge rows, were the generator ever to emit them, are two
    // edges and correctly bind twice — don't assert distinctness).
    val loops = pairs(frame).filter(p => p._2 == p._3)
    assert(loops == pairs(out).filter(p => p._2 == p._3),
      "self-loop bindings diverge from the OUT arm")
    // An undirected hop sees strictly more edges than OUT alone
    // whenever any pruned edge points INTO the anchor set.
    assert(pairs(frame).size >= pairs(out).size)
  }

  test("typed path-pattern family plans: keyed joins only, and the " +
    "property prune sits under the hop join") {
    // Every level/relaxation/propagation join in the path kernels is
    // an equi-join on the pattern variable — a cartesian anywhere
    // would be |frontier|·|E|. The 1-row mx scalar broadcast from
    // the catalog construction is the only nested loop allowed.
    for (name <- Seq("g_catalog_allshortest", "g_catalog_wshortest",
      "g_catalog_components")) {
      val plan = Registry.byName(name).run(t)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), name)
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      assert(bnlj <= 2, s"$name: expected only scalar broadcasts, $bnlj")
    }
  }

  test("catalog TOP-K / ALL-path agree with each other and reach the " +
    "derived target") {
    val topk = Registry.byName("g_catalog_topk").run(t).collect()
    val all = Registry.byName("g_catalog_allpaths").run(t).collect()
    assert(topk.nonEmpty && all.nonEmpty)
    assert(topk.length <= 3)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("len"), r.getAs[String]("path"))
    // top-k is exactly the (len, path)-first slice of the full
    // enumeration — same machinery, same ordering, k cut only.
    assert(topk.map(key).toSeq ==
      all.map(key).sorted.take(topk.length).toSeq)
    // Every enumerated path starts at the anchor and is simple.
    all.foreach { r =>
      val nodes = r.getAs[String]("path").split("->")
      assert(nodes.head == "1", r.toString)
      assert(nodes.distinct.length == nodes.length,
        s"non-simple path: ${r.getAs[String]("path")}")
    }
  }

  test("g_catalog_components: labels are a fixpoint partition of the " +
    "pruned typed graph") {
    val comp = Registry.byName("g_catalog_components").run(t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = cat.edge("knows").edges
      .filter(col("strength") >= 90).select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comp.nonEmpty && edges.nonEmpty)
    // Fixpoint: every edge joins two nodes of the SAME component.
    edges.foreach { case (s, d) =>
      assert(comp(s) == comp(d), s"edge ($s,$d) crosses components")
    }
    // Labels are canonical minima: each component's label is its
    // smallest member, and more than one component exists at the
    // chosen threshold (the fragmentation the entry pins).
    val byComp = comp.groupBy(_._2)
    byComp.foreach { case (label, members) =>
      assert(members.keys.min == label, s"component $label not minimal")
    }
    assert(byComp.size > 1, "threshold no longer fragments the graph")
  }

  test("g_catalog_mutate: delete lands before insert (a weak reverse " +
    "edge no longer blocks), existing pairs are insert-IGNOREd, weak " +
    "edges are gone") {
    import spark.implicits._
    // (src, dst, since, strength) — four corners:
    //   (1,2,99) strong, reverse (2,1,3) WEAK -> delete first, then
    //            the reverse insert of (1,2) lands as (2,1,99);
    //   (3,4,98) strong, reverse (4,3,50) EXISTS -> insert ignored;
    //   (5,6,97) below the reciprocity bar -> no insert;
    //   (7,8,2)  weak -> deleted outright.
    val d0 = java.sql.Date.valueOf("1995-01-01")
    val knows = Seq(
      (1L, 2L, d0, 99L), (2L, 1L, d0, 3L),
      (3L, 4L, d0, 98L), (4L, 3L, d0, 50L),
      (5L, 6L, d0, 97L), (7L, 8L, d0, 2L))
      .toDF("src", "dst", "since", "strength")
    val post = graft.graph.CatalogQueries.mutatedKnows(knows)
      .select("src", "dst", "strength")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(post == Set(
      (1L, 2L, 99L), (2L, 1L, 99L),          // reverse inserted
      (3L, 4L, 98L), (4L, 3L, 50L),          // existing pair kept as-is
      (5L, 6L, 97L)))                        // weak edges gone
    // The driver-facing entry runs the same pipeline end-to-end
    // over the declared catalog and respects edge identity.
    val res = Registry.byName("g_catalog_mutate").run(t)
    assert(res.count() > 0)
  }
}
