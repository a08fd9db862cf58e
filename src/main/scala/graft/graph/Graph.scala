package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph traversal engine — the Spark realization of the tigraph
  * extension (reference: /root/reference/executor/graph.go
  * GraphEdgeScanExecutor, /root/reference/executor/graph_shortest.go,
  * /root/reference/parser/ast/graph.go MATCH path patterns with
  * IN/OUT/BOTH direction and ANY/ALL/TOP-K SHORTEST).
  *
  * The reference traverses adjacency via TiKV point-gets per level;
  * the Spark-native design instead keeps the edge list as a DataFrame
  * pre-partitioned (`repartition` on `src`) so every BFS level is a
  * co-partitioned join, and the frontier stays distributed end to end
  * — the only driver-side values are empty-frontier flags. At cluster
  * scale the frontier join auto-broadcasts (AQE) while small, and
  * shuffles on `src` once it outgrows the broadcast threshold.
  *
  * Edge schema: `src: BIGINT, dst: BIGINT`.
  */
final case class Graph(edges: DataFrame) {

  /** Lineage truncation for iterative loop state — the shared
    * [[graft.tools.Reliable]] discipline: `localCheckpoint()` by
    * default, a reliable parquet checkpoint when
    * `spark.graft.graph.checkpointDir` is set (cluster block-loss
    * survival; rationale lives on Reliable). */
  private implicit class Cp(df: DataFrame) {
    def cp(): DataFrame = graft.tools.Reliable.cp(df)
    /** Deferred-materialization checkpoint — use ONLY when the very
      * next driver action full-scans this frame (convergence sum,
      * count): that action's job materializes the blocks, folding
      * the checkpoint job away (see [[graft.tools.Reliable.cpLazy]]). */
    def cpLazy(): DataFrame = graft.tools.Reliable.cpLazy(df)
  }

  /** The BOTH-orientation edge table, materialized ONCE per Graph
    * instance (lazy — graphs that never traverse undirected never
    * pay it). With [[Graph.derived]] memoizing instances per
    * (session, input), every undirected kernel over the same derived
    * graph — CC, k-core, LPA — starts from this one checkpoint
    * instead of re-running the union+distinct per entry. */
  private[graph] lazy val bothCp: DataFrame = new Cp(oriented("both")).cp()
  private lazy val outCp: DataFrame = new Cp(oriented("out")).cp()
  private lazy val inCp: DataFrame = new Cp(oriented("in")).cp()

  /** Canonical undirected edge set — (min, max) per edge, self-loops
    * dropped, distinct — materialized once per instance: the shared
    * input of the triangle-counting family (triangles, clustering,
    * coreness, k-truss, assortativity), which otherwise rebuilt it
    * per entry. */
  private[graph] lazy val canonCp: DataFrame =
    new Cp(edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()).cp()

  /** Distinct DIRECTED edge set, materialized once per instance —
    * SCC's live-edge seed (the per-direction materializations keep
    * duplicate parallel edges; SCC's trim/coloring loops want the
    * distinct set, which was rebuilt per entry before this). */
  private[graph] lazy val distinctCp: DataFrame =
    new Cp(edges.select("src", "dst").distinct()).cp()

  /** The materialized edge table for `direction` — built lazily,
    * once per Graph instance, with the loop checkpoint discipline
    * (reliable dir when configured, localCheckpoint otherwise).
    * Every traversal kernel starts from one of these three, so with
    * [[Graph.derived]] memoizing instances, a session's 30-odd
    * derived-graph entries share three materializations total
    * instead of one per entry. */
  private def orientedCp(direction: String): DataFrame = direction match {
    case "out"  => outCp
    case "in"   => inCp
    case "both" => bothCp
  }

  /** The CHECKPOINTED orientation — for kernels outside this class
    * that would otherwise re-run oriented("both")'s union+distinct
    * per entry (same rows as [[oriented]]; materialized once per
    * instance and shared through [[Graph.derived]]'s memo). */
  def orientedShared(direction: String): DataFrame =
    orientedCp(direction)

  /** Edges usable for a traversal in `direction` (OUT, IN or BOTH —
    * ast.GraphEdgeDirection in the reference). */
  def oriented(direction: String): DataFrame = direction match {
    case "out"  => edges.select("src", "dst")
    case "in"   => edges.select(col("dst").as("src"), col("src").as("dst"))
    case "both" => oriented("out").union(oriented("in")).distinct()
  }

  /** 1-hop neighbor expansion from an optional source predicate. */
  def hop(direction: String, from: DataFrame): DataFrame =
    from.join(oriented(direction), "src")

  /** Distinct nodes reachable from `sources` within `maxHops`,
    * direction-aware. */
  def reach(sources: DataFrame, direction: String, maxHops: Int): DataFrame = {
    // Materialize the (possibly union-distinct) edge table once; every
    // BFS level joins the checkpointed table instead of re-deriving it.
    // For a bounded hop count the whole expansion is declared LAZILY —
    // level k = distinct neighbors of level k-1 — and executed as ONE
    // job (maxHops chained shuffle stages), instead of a driver loop
    // paying per-round scheduling + empty-frontier actions. Each level
    // is distinct-bounded by |V|, so an exhausted frontier just flows
    // empty through the remaining stages for free.
    val e = orientedCp(direction)
    val seed = sources.select(col("src").as("node")).distinct()
    var levels = List(seed)
    for (_ <- 1 to maxHops) {
      val frontier = levels.head
      levels ::= frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
    }
    levels.reduce(_ union _).distinct()
  }

  /** Variable-length path pattern `*min..max` (ast/graph.go
    * GraphVariableSpec — `MATCH -[e*2..4]->` with a per-edge WHERE,
    * which callers apply by pre-filtering the edge list this Graph
    * wraps): distinct (node, hops) pairs reachable in min..max hops
    * under walk semantics. Same lazy one-job level chain as
    * [[reach]] — level k = distinct neighbors of level k-1 — but
    * levels keep their hop tag, so the 2..4 window is a plain filter
    * on the unioned levels. */
  def reachLevels(sources: DataFrame, direction: String,
      minHops: Int, maxHops: Int): DataFrame = {
    val e = orientedCp(direction)
    val seed = sources.select(col("src").as("node")).distinct()
    var levels = List(seed.select(col("node"), lit(0).as("hops")))
    for (d <- 1 to maxHops) {
      val frontier = levels.head.select("node")
      levels ::= frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .select(col("node"), lit(d).as("hops"))
    }
    // Pairs are distinct within a level and levels differ by tag, so
    // the union is already distinct.
    levels.reduce(_ union _).filter(col("hops") >= minHops)
  }

  /** Multi-source closeness centrality: per root, the count of nodes
    * reachable within `maxHops`, the sum of their BFS distances, and
    * closeness = n_reached / sum_dist. ONE tagged lazy level chain
    * serves every root simultaneously (level k = distinct
    * (root, neighbor) pairs of level k-1 — the [[reachLevels]] shape
    * with a root tag), so adding roots widens the frontier rows
    * instead of multiplying BFS loops; MIN(hops) over the unioned
    * levels recovers exact BFS distances without a visited-set
    * anti-join. State is bounded by roots·|V| per level. */
  def closeness(roots: Seq[Long], direction: String,
      maxHops: Int): DataFrame = {
    val e = orientedCp(direction)
    val ss = e.sparkSession
    import ss.implicits._
    val seed = roots.toDF("root")
      .select(col("root"), col("root").as("node"), lit(0).as("hops"))
    var levels = List(seed)
    for (d <- 1 to maxHops) {
      val f = levels.head.select("root", "node")
      levels ::= f.join(e, f("node") === e("src"))
        .select(col("root"), col("dst").as("node")).distinct()
        .select(col("root"), col("node"), lit(d).as("hops"))
    }
    levels.reduce(_ union _)
      .groupBy("root", "node").agg(min("hops").as("md"))
      .groupBy("root")
      .agg((count(lit(1)) - 1).as("n_reached"),
        sum("md").as("sum_dist"),
        round((count(lit(1)) - 1) /
          nullif(sum("md"), lit(0)).cast("double"), 6).as("closeness"))
  }

  /** Frontiers below this row count expand TWO BFS levels per job
    * (see [[shortestDistances]]): small enough that recomputing the
    * unmaterialized first level inside the second level's plan is
    * cheaper than an extra driver round + checkpoint. */
  private val TwoHopFrontierMax = 10000L

  /** One BFS level: distinct unvisited neighbors of `frontier`,
    * tagged `dist`. Alias-qualified join keys so the caller can chain
    * two levels inside one lazy plan without ambiguous-attribute
    * clashes against the shared edge table. */
  private def bfsLevel(e: DataFrame, frontier: DataFrame,
      visited: DataFrame, dist: Int): DataFrame =
    frontier.select("node").as("f")
      .join(e.as("ed"), expr("f.node = ed.src"))
      .select(col("ed.dst").as("node")).distinct()
      .join(visited.select("node"), Seq("node"), "left_anti")
      .select(col("node"), lit(dist).as("dist"))

  /** ANY SHORTEST analog (graph_shortest.go): minimal hop distance
    * from `source` to every node reachable within `maxHops`. Proper
    * BFS — each level anti-joins the visited set, so a node's first
    * (= minimal) level wins and the frontier shrinks monotonically.
    * While the frontier is measured-small, TWO levels expand inside
    * one lazy plan/job (level d+2 derives from the anti-joined level
    * d+1 exactly as two sequential rounds would — identical result),
    * halving driver-loop rounds on long thin traversals. */
  def shortestDistances(source: Long, direction: String,
      maxHops: Int): DataFrame = {
    val e = orientedCp(direction)
    var visited = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0).as("dist"))
      .cp()
    var frontier = visited
    var frontierN = 1L
    var hopN = 0
    var done = false
    while (hopN < maxHops && !done) {
      val twoHop = hopN + 2 <= maxHops && frontierN <= TwoHopFrontierMax
      val l1 = bfsLevel(e, frontier, visited, hopN + 1)
      val next = (if (!twoHop) l1 else {
        val l2 = bfsLevel(e, l1,
          visited.select("node").union(l1.select("node")), hopN + 2)
        l1.union(l2)
      }).cpLazy()
      hopN += (if (twoHop) 2 else 1)
      // ONE full-scan aggregate returns both loop scalars — total new
      // nodes (empty ⇒ done) and the deepest level's size (the next
      // frontier) — and materializes the lazy checkpoint in the same
      // job. `visited` stays a LAZY union chain over the per-level
      // cached frames (≤ maxHops arms, levels are disjoint by the
      // anti-join): scanning the chain costs the same rows as the
      // flattened copy the old per-round union checkpoint built, so
      // that extra materialization job per level is gone.
      val r = next.agg(count(lit(1)),
        count(when(col("dist") === hopN, true))).head()
      if (r.getLong(0) == 0L) done = true
      else {
        visited = visited.union(next)
        // Only the deepest level seeds the next expansion; if the
        // second hop of a batch came back empty the loop is done.
        frontier = next.filter(col("dist") === hopN)
        frontierN = r.getLong(1)
        done = frontierN == 0
      }
    }
    visited
  }

  /** ALL SHORTEST analog (ast.GraphPathPatternTypeAllShortestPath):
    * per reachable node, the minimal hop distance AND the number of
    * distinct shortest paths. Level-synchronized BFS where the
    * frontier carries path counts — a node first reached at level d
    * has count = Σ counts of its level-(d-1) predecessors. Counting
    * stays fully distributed (groupBy dst + sum). */
  def shortestPathCounts(source: Long, direction: String,
      maxHops: Int): DataFrame = {
    val e = orientedCp(direction)
    var visited = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0).as("dist"),
        lit(1L).as("n_paths"))
      .cp()
    // One counting level: a node first reached at depth d has
    // n_paths = Σ n_paths of its depth-(d-1) predecessors — which is
    // exactly the (anti-joined) previous frontier, so chaining two
    // levels lazily is the same recurrence as two sequential rounds.
    def level(frontier: DataFrame, vis: DataFrame, dist: Int): DataFrame =
      frontier.select("node", "n_paths").as("f")
        .join(e.as("ed"), expr("f.node = ed.src"))
        .groupBy(col("ed.dst")).agg(sum(col("f.n_paths")).as("n_paths"))
        .join(vis.select(col("node").as("dst")), Seq("dst"), "left_anti")
        .select(col("dst").as("node"), lit(dist).as("dist"),
          col("n_paths"))
    var frontier = visited
    var frontierN = 1L
    var hopN = 0
    var done = false
    while (hopN < maxHops && !done) {
      // Same two-hop batching as shortestDistances: halve driver
      // rounds while the frontier is measured-small.
      val twoHop = hopN + 2 <= maxHops && frontierN <= TwoHopFrontierMax
      val l1 = level(frontier, visited, hopN + 1)
      val next = (if (!twoHop) l1 else {
        val l2 = level(l1,
          visited.select("node").union(l1.select("node")), hopN + 2)
        l1.union(l2)
      }).cpLazy()
      hopN += (if (twoHop) 2 else 1)
      // Same one-job fold as shortestDistances: the scalar aggregate
      // materializes the lazy checkpoint; visited stays a lazy union
      // chain over the disjoint cached levels.
      val r = next.agg(count(lit(1)),
        count(when(col("dist") === hopN, true))).head()
      if (r.getLong(0) == 0L) done = true
      else {
        visited = visited.union(next)
        frontier = next.filter(col("dist") === hopN)
        frontierN = r.getLong(1)
        done = frontierN == 0
      }
    }
    visited
  }

  /** Weighted shortest distance (Bellman-Ford relaxation, bounded to
    * `maxHops` edges) — the weighted extension of ANY SHORTEST
    * (graph_shortest.go tracks hop counts; edge weights generalize
    * it). Each round relaxes every tentative distance through the
    * weighted edge list and keeps the per-node minimum, so round i
    * holds the cheapest path of ≤ i edges. All-distributed: the
    * tentative-distance table shuffles on `node`, never enumerates
    * paths, and is bounded by |V| rows regardless of edge count —
    * the 100 TB-safe property the walk-enumerating oracle lacks.
    *
    * `wedges` schema: src, dst, w (BIGINT weight). */
  def weightedShortest(wedges: DataFrame, source: Long,
      maxHops: Int): DataFrame = {
    val we = wedges.cp()
    var dist = wedges.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("wdist"))
      .cp()
    // Tentative distances only ever (a) add nodes or (b) decrease, so
    // the (row count, distance sum) pair is a strictly improving
    // convergence measure: once stable, every later round is a no-op
    // and the loop stops early (same early-stop idea as
    // connectedComponents' label sum).
    var prev = (-1L, -1L)
    var hopN = 0
    while (hopN < maxHops && {
        val r = dist.agg(count(lit(1)), sum(col("wdist"))).head()
        val cur = (r.getLong(0), r.getLong(1))
        val improving = cur != prev
        prev = cur
        improving
      }) {
      hopN += 1
      val relaxed = dist.join(we, dist("node") === we("src"))
        .select(col("dst").as("node"), (col("wdist") + col("w")).as("wdist"))
      // Lazy checkpoint: the loop condition's convergence aggregate
      // (or, after the final hop, the caller's own action) is the
      // full scan that materializes each round's state — one job per
      // round instead of two.
      dist = dist.union(relaxed)
        .groupBy("node").agg(min(col("wdist")).as("wdist"))
        .cpLazy()
    }
    dist
  }

  /** PageRank, fixed iteration count, non-normalized convention
    * (init 1.0; rank = (1-d) + d·Σ in-rank/out-deg; dangling mass
    * not redistributed). Each round is one co-partitioned join plus
    * one aggregation on dst — rank state is |V| rows. Output rounded
    * to 6dp so cross-engine float summation noise (~1e-15 relative)
    * cannot surface. */
  def pageRank(iters: Int, damping: Double = 0.85): DataFrame = {
    val (edeg, nodes, init) = pageRankState()
    // TWO rounds chain per checkpoint/job (the connectedComponents
    // trick): the edge side of both rounds' joins is the same
    // pre-partitioned checkpoint, so the lazy two-round plan is
    // co-partitioned joins + aggs only and the |V|-row state
    // materializes half as often. A FULLY unrolled plan measured
    // slower (see pageRankState); the pairwise chain keeps jobs
    // shallow while halving the scheduling.
    var ranks = init
    var i = 0
    while (i + 2 <= iters) {
      ranks = pageRankRound(edeg, nodes,
        pageRankRound(edeg, nodes, ranks, damping), damping).cp()
      i += 2
    }
    if (i < iters)
      ranks = pageRankRound(edeg, nodes, ranks, damping).cp()
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** The loop inputs: fused (src, dst, deg) edge table hash-
    * partitioned on src, node set, initial ranks — exposed so plan
    * tests can assert the per-round shape before checkpointing. */
  def pageRankState(): (DataFrame, DataFrame, DataFrame) = prState

  /** Built lazily ONCE per Graph instance: rank loops (global and
    * personalized) over the same memoized derived graph share the
    * fused-degree edge table, node set and init state instead of
    * rebuilding them per entry. */
  private lazy val prState: (DataFrame, DataFrame, DataFrame) = {
    // Spark 4's WITH RECURSIVE can't express this (aggregates over the
    // recursive reference are rejected: INVALID_RECURSIVE_REFERENCE;
    // measured: a fully lazy 10-round unrolled plan is also SLOWER —
    // 4.6 s vs 3.3 s — because every per-round broadcast/AQE stage
    // serializes inside one job). So: per-round materialization of the
    // |V|-row rank state, with the out-degree pre-fused into the edge
    // list once (one join per round, not two) and the fused table
    // hash-partitioned on `src` so the |E|-row side of each round's
    // rank join stays in place — localCheckpoint preserves the
    // physical HashPartitioning, so EnsureRequirements only shuffles
    // the |V|-row sides. NO broadcast hints: a forced broadcast of the
    // full rank state is an unconditional promise that OOMs executors
    // once |V| outgrows the broadcast threshold (≥1e8 vertices at
    // 100 TB); without the hint AQE still broadcasts the rank side
    // while it is measured-small, and degrades gracefully to the
    // co-partitioned shuffle join when it isn't.
    val e = orientedCp("out")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .cp()
    val edeg = e.join(
        e.groupBy(col("src").as("d_node")).agg(count(lit(1)).as("deg")),
        col("src") === col("d_node"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .cp()
    val init = nodes.select(col("node"), lit(1.0).as("rank"))
      .cp()
    (edeg, nodes, init)
  }

  /** One PageRank round as a pure declarative plan: contribution join
    * on the pre-partitioned edge table, dst aggregation, rank update.
    * Hint-free by design (see pageRankState). */
  def pageRankRound(edeg: DataFrame, nodes: DataFrame, ranks: DataFrame,
      damping: Double): DataFrame = {
    val contribs = edeg
      .join(ranks, col("node") === col("src"))
      .groupBy(col("dst"))
      .agg(sum(col("rank") / col("deg")).as("c"))
    nodes
      .join(contribs, col("node") === col("dst"), "left")
      .select(col("node"),
        (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0)))
          .as("rank"))
  }

  /** Personalized PageRank (reference analog: executor/graph.go's
    * traversal machinery + the PageRank convention of [[pageRank]],
    * teleport restricted to a SEED set — "importance relative to
    * these nodes", the recommendation/similar-entity primitive that
    * global PageRank cannot express). Non-normalized convention
    * mirroring [[pageRank]]: rank = (1−d)·1_{v∈seeds} + d·Σ
    * in-rank/out-deg, init 1.0 on seeds else 0. Same per-round
    * shape (co-partitioned contribution join + dst aggregation,
    * |V|-row state, no broadcast of the rank state); mass stays
    * concentrated near the seeds, and exact zeros (nodes unreachable
    * from the seed set) are dropped — the locality that makes PPR
    * cheaper than global PageRank at 100 TB. */
  def personalizedPageRank(seedMax: Long, iters: Int,
      damping: Double = 0.85): DataFrame = {
    val (edeg, nodes, _) = pageRankState()
    val flagged = nodes
      .withColumn("seed", (col("node") < seedMax).cast("double"))
      .cp()
    def pprRound(r: DataFrame): DataFrame = {
      val contribs = edeg
        .join(r, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("c"))
      flagged
        .join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("seed") +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
    }
    // TWO rounds per checkpoint/job, like pageRank above — same
    // co-partitioned round shape, half the |V|-row materializations.
    var ranks = flagged.select(col("node"), col("seed").as("rank"))
    var i = 0
    while (i + 2 <= iters) { ranks = pprRound(pprRound(ranks)).cp(); i += 2 }
    if (i < iters) ranks = pprRound(ranks).cp()
    ranks.filter(col("rank") > 0)
      .select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** Time-respecting (temporal) reachability: nodes reachable from
    * the seed set within `maxHops` hops along edges whose timestamps
    * are NON-DECREASING down the path — "what could this event have
    * caused", the causality query a plain BFS gets wrong (it happily
    * walks backwards in time). State per level: the earliest arrival
    * per node — min-combined via lossless dominance pruning (an
    * EARLIER arrival admits a superset of continuations, so only it
    * needs to continue), which bounds frontier state by NODE
    * cardinality instead of (node, ts)-pair cardinality. Per-level
    * rows therefore do NOT match the unrolled CTE's distinct-pair
    * levels; the per-node FINAL min does, which is the only thing
    * the output (and the oracle) states. Output: per
    * node, the EARLIEST time the seed set can reach it. Edge input:
    * (src, dst, ts) triples. */
  def temporalReach(tedges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val te = tedges.select("src", "dst", "ts").distinct().cp()
    val seed = seeds.select(col("src").as("node")).distinct()
    var frontier = seed.select(col("node"),
      lit("1990-01-01 00:00:00").cast("timestamp").as("at"))
    var levels = List.empty[DataFrame]
    for (_ <- 1 to maxHops) {
      // Dominance pruning, min-combined per node (lossless): an
      // EARLIER arrival admits a superset of continuations (every
      // edge with ts >= later-at also has ts >= earlier-at) and the
      // output is the min over arrivals anyway, so only the earliest
      // arrival per node needs to continue — the frontier is
      // |nodes|-bounded instead of |(node, ts)|-bounded, which is
      // the difference between node-cardinality and edge-cardinality
      // state on a timestamp-rich graph.
      frontier = frontier.as("F")
        .join(te.as("E"),
          expr("E.src = F.node AND E.ts >= F.at"))
        .groupBy(col("E.dst").as("node"))
        .agg(min(col("E.ts")).as("at"))
      levels ::= frontier
    }
    levels.reduce(_ union _)
      .groupBy("node")
      .agg(min(col("at")).as("first_reach"))
  }

  /** Connected components by min-label propagation (undirected).
    * Each round every node takes the minimum of its own label and its
    * neighbors' labels; the loop runs to a fixpoint (stable-count
    * check is the only driver-side value), reaching the component-
    * minimum node id within the component diameter. State is one
    * (node, label) row per vertex — |V|-bounded like the BFS ops,
    * shuffled on node each round. */
  def connectedComponents(): DataFrame =
    connectedComponentsWithStats()._1

  /** Adaptive CC kernel: plain min-label propagation, with pointer-
    * jumping label compression (`component := component(component)`)
    * enabled ONLY when the measured convergence rate says the graph
    * is diameter-bound. The r15 A/B showed compression helps sparse
    * long-chain graphs (rounds ~ diameter without it) but is pure
    * overhead on dense graphs that converge in ~2 cycles — so the
    * decision is taken from the label-sum trajectory itself, not a
    * static flag: after each 2-round cycle the per-cycle decrease
    * d_k is compared to d_{k-1}; a dense graph's decrease collapses
    * geometrically (d_k < d_{k-1}/8 → it is about to converge, leave
    * compression off), while a chain-like graph keeps resolving
    * labels at a near-constant rate (d_k >= d_{k-1}/8 after cycle 2
    * → remaining work is diameter-bound, turn compression on for all
    * subsequent cycles). The rate cut is 1/8, not the r16 1/4: a
    * mixed graph (one big near-converged blob + sparse chains — the
    * catalog shape) sees its first-cycle decrease dominated by the
    * blob, so the chain signal at the cycle-2 test reads as a
    * 1/8-to-1/4 fraction and the 1/4 rule burned one extra plain
    * cycle before engaging (r17 A/B at sf0.1, back-to-back in one
    * window: g_catalog_components 5.75 → 4.98/5.05 with controls
    * flat; g_cc converges before the test ever fires under either
    * cut, so dense graphs are unaffected by construction).
    * Compression is exact: labels only ever
    * decrease and label values are node ids, so re-reading the
    * label's own current label is monotone and preserves the
    * fixpoint; it turns O(diameter) cycles into O(log diameter).
    * Returns (labels, CcStats) so specs can pin the adaptive
    * decision on constructed chain/dense graphs. */
  def connectedComponentsWithStats(): (DataFrame, Graph.CcStats) = {
    val und = bothCp
    // Lazy checkpoints throughout this loop: every materialization
    // point is immediately followed by the label-sum scalar, whose
    // job computes AND caches the state — one job per cycle instead
    // of a checkpoint job plus a cached re-scan (§5 driver
    // round-trips; the fixpoint and labels are unchanged).
    var labels = und.select(col("src").as("node"))
      .distinct()
      .select(col("node"), col("node").as("component"))
      .cpLazy()
    // One min-label propagation round; alias-qualified so two rounds
    // can chain inside one lazy plan (the inner round's aggregation
    // exchange is reused by Spark's ReuseExchange across its two
    // consumers).
    def round(l: DataFrame): DataFrame =
      l.as("L").join(und.as("E"), expr("L.node = E.src"))
        .select(col("E.dst").as("node"), col("L.component").as("component"))
        .union(l)
        .groupBy("node").agg(min(col("component")).as("component"))
    // Pointer jumping: every node re-reads the current label OF its
    // label node. Left join (not inner) — a component-minimum node
    // labels itself, and self-rows survive either way, but left keeps
    // the invariant obvious: no row is ever dropped. Applied to the
    // MATERIALIZED state (labels is always cp'd), before the cycle's
    // propagation rounds — self-joining the lazy two-round plan
    // instead trips Catalyst's union constraint rewrite, and the
    // fixpoint is the same whichever side of the rounds the jump
    // runs on (both operators are monotone non-increasing).
    def compress(l: DataFrame): DataFrame =
      l.as("A")
        .join(l.select(col("node").as("cn"), col("component").as("cc")),
          col("A.component") === col("cn"), "left")
        .select(col("A.node").as("node"),
          coalesce(col("cc"), col("A.component")).as("component"))
    // Labels only ever decrease, so the label sum is a strictly
    // decreasing convergence measure — one cheap scalar aggregate per
    // materialization instead of a join/except against the previous
    // state. TWO rounds run per job/checkpoint (the same fixpoint is
    // reached — propagation is monotone — with half the driver
    // scheduling; the sum check just observes every second round).
    var prevSum = labels.agg(sum(col("component"))).head().getLong(0)
    var prevDec = -1L
    var cycles = 0
    var compressFrom = -1
    var converged = false
    while (!converged) {
      cycles += 1
      val compressing = compressFrom > 0
      val next =
        round(round(if (compressing) compress(labels) else labels)).cpLazy()
      val nextSum = next.agg(sum(col("component"))).head().getLong(0)
      val dec = prevSum - nextSum
      converged = dec == 0L
      // Rate test (re-evaluated each cycle until it fires, so the
      // earliest it can enable compression is cycle 3 — after two
      // plain cycles): still resolving at >= 1/8 the previous
      // cycle's rate means the remaining structure is chain-like
      // (diameter-bound), so every later cycle gets the extra
      // compression join. Once on, it stays on.
      if (!converged && compressFrom < 0 && prevDec > 0 &&
          dec * 8L >= prevDec)
        compressFrom = cycles + 1
      prevDec = dec
      prevSum = nextSum
      labels = next
    }
    (labels, Graph.CcStats(cycles, compressFrom))
  }

  /** Bounded-depth Brandes dependency scores from pinned roots — the
    * betweenness-centrality core (who sits on the shortest paths;
    * shortest-path machinery per the reference's
    * graph_shortest.go:141,192 — computeShortest/computeShortestAll —
    * with Brandes' accumulation on top).
    * Forward: one TAGGED multi-root BFS (the g_closeness trick —
    * roots widen frontier rows, not loop count) accumulating σ =
    * shortest-path counts per (root, node), visited-pruned, ≤
    * maxDepth levels. Backward: Brandes' level-by-level dependency
    * accumulation δ(v) = Σ_{w ∈ succ(v), dist(w)=dist(v)+1}
    * σ(v)/σ(w) · (1+δ(w)) — maxDepth more co-partitioned joins.
    * Bounded depth IS the operator's semantics (exactly what the
    * unrolled oracle states; levels past the diameter are empty and
    * free). State is one row per (root, visited node) — |roots|·|V|
    * bound, same contract as the other tagged loops; the σ and δ
    * aggregations are both map-combined. Rooted sampling is also how
    * betweenness is actually estimated at scale (exact all-pairs
    * Brandes is O(V·E) — the sampled estimator IS the production
    * algorithm). */
  def dependencyScores(roots: Seq[Long], maxDepth: Int): DataFrame = {
    // Depth 0/1 has no interior vertices, so the backward
    // accumulation below would never seed `acc` (and the unrolled
    // oracle's UNION list would be empty) — reject loudly instead of
    // NPE-ing later.
    require(maxDepth >= 2,
      s"dependencyScores needs maxDepth >= 2 (got $maxDepth): " +
        "betweenness over paths of length < 2 is identically zero")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = orientedCp("out")
    var frontier = roots.toDF("root")
      .select(col("root"), col("root").as("node"), lit(1L).as("sigma"))
      .cp()
    // visited is a union chain over already-cp'd level outputs —
    // shallow, no checkpoint of its own needed.
    var visited = frontier.select("root", "node")
    var levels = Vector(frontier)
    for (_ <- 1 to maxDepth) {
      val nxt = frontier.as("F").join(e.as("E"), expr("F.node = E.src"))
        .select(col("F.root").as("root"), col("E.dst").as("node"),
          col("F.sigma").as("sigma"))
        .join(visited, Seq("root", "node"), "left_anti")
        .groupBy("root", "node").agg(sum("sigma").as("sigma"))
        .cp()
      levels :+= nxt
      visited = visited.union(nxt.select("root", "node"))
      frontier = nxt
    }
    // Backward stages chain LAZILY (≤ maxDepth joins over cp'd level
    // frames) — one job materializes the whole accumulation instead
    // of maxDepth driver-synced checkpoints.
    var above = levels(maxDepth)
      .select(col("root"), col("node"), col("sigma"),
        lit(0.0).as("delta"))
    var acc: DataFrame = null
    for (d <- (maxDepth - 1) to 0 by -1) {
      val scored = levels(d).as("F")
        .join(e.as("E"), expr("F.node = E.src"), "left")
        .join(above.as("B"),
          expr("B.root = F.root AND B.node = E.dst"), "left")
        .groupBy(col("F.root").as("root"), col("F.node").as("node"),
          col("F.sigma").as("sigma"))
        .agg(coalesce(sum(col("F.sigma") * (lit(1.0) + col("B.delta"))
          / col("B.sigma")), lit(0.0)).as("delta"))
      if (d >= 1) acc = if (acc == null) scored else acc.union(scored)
      above = scored
    }
    // Level-0 rows are the roots themselves (Brandes excludes the
    // source); interior appearances of OTHER roots stay counted.
    acc.groupBy("node")
      .agg(sum("delta").as("d"))
      .filter(col("d") > 0)
      .select(col("node"), round(col("d"), 4).as("betw"))
  }

  /** Deterministic random walks (DeepWalk/node2vec corpus sampling —
    * graph-structure training data). The "random" neighbor choice at
    * step i of walk w is index md5(w:i) mod degree into the SORTED
    * neighbor array, so both engines (and any two runs) materialize
    * the IDENTICAL walk corpus — the t_shuffle/d_split hash-coin
    * principle applied to graph sampling. Scale: the adjacency build
    * is one groupBy(src) (arrays bounded by real degree; hubs get the
    * same salting/cap treatment as g_jaccard at 100 TB), and each
    * step is one co-partitioned join of |walks| state rows against
    * adjacency — state carries (walk, cur, path), never the
    * neighborhood. Dead ends retire the walk (kept, shorter path),
    * matching the oracle's stay-in-place CASE arithmetic. */
  def randomWalks(maxStart: Long, perStart: Int, steps: Int): DataFrame = {
    require(perStart >= 1, s"perStart must be positive (got $perStart)")
    val adj = oriented("out").groupBy("src")
      .agg(sort_array(collect_set(col("dst"))).as("nbrs")).cp()
    val starts = adj.select("src").filter(col("src") < maxStart)
    var state = starts
      .select(col("src"), explode(sequence(lit(0), lit(perStart - 1)))
        .as("w"))
      // walk_id = src * perStart + w is collision-free for ANY
      // perStart (w < perStart by construction); the previous
      // src*10+w encoding silently collided past perStart 10,
      // corrupting both the corpus and the md5(walk_id:step) coin.
      .select((col("src") * perStart + col("w")).as("walk_id"),
        col("src").as("start"), col("src").as("cur"),
        col("src").cast("string").as("path"))
    var finished = state.limit(0)
    for (i <- 1 to steps) {
      val idx = expr(s"conv(substr(md5(concat(cast(walk_id as string), ':', '$i')), 1, 8), 16, 10)")
        .cast("long") % size(col("nbrs"))
      val joined = state.join(adj, state("cur") === adj("src"), "left")
      finished = finished.union(joined.filter(col("nbrs").isNull)
        .select(col("walk_id"), col("start"), col("cur"), col("path")))
      val nxt = element_at(col("nbrs"), (idx + 1).cast("int"))
      state = joined.filter(col("nbrs").isNotNull)
        .select(col("walk_id"), col("start"), nxt.as("cur"),
          concat(col("path"), lit("->"), nxt.cast("string")).as("path"))
    }
    finished.union(state)
  }

  /** Community detection by synchronous label propagation (LPA), the
    * bounded-iteration workhorse for community structure where CC is
    * too coarse (CC merges everything touching; LPA keeps densely-
    * linked clusters apart). Fully deterministic: every round, each
    * vertex adopts its neighbors' most frequent label, ties broken by
    * the smallest label — an argmin over (-count, label), so the same
    * graph always yields the same communities (classic LPA's random
    * tie-breaks would be un-oracle-able). Fixed `iters` rounds, no
    * convergence test — synchronous LPA can 2-cycle on bipartite-ish
    * structures, so a bounded unrolled run IS the semantics (and what
    * the unrolled SQL oracle reproduces). Scale: per round, one
    * (node, lbl) count with map-side partials (key space bounded by
    * Σdeg) and one per-node min_by agg — state is |V| rows, nothing
    * wider than an edge shuffles, hub vertices are safe because label
    * counts combine map-side before the exchange. */
  def labelPropagation(iters: Int): DataFrame =
    labelPropagation(iters, bothCp)

  /** [[labelPropagation]] over a caller-supplied (already
    * checkpointed) both-orientation edge list — callers that also
    * need the undirected edges themselves (g_modularity's within-
    * community count) pass theirs in so the derived-edge build runs
    * ONCE, not once per consumer. */
  def labelPropagation(iters: Int, undPre: DataFrame): DataFrame = {
    val und = undPre
    def round(l: DataFrame): DataFrame =
      und.as("E").join(l.as("L"), expr("E.dst = L.node"))
        .groupBy(col("E.src").as("node"), col("L.lbl").as("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(expr("min_by(lbl, struct(-cnt, lbl))").as("lbl"))
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    // TWO synchronous rounds chain per checkpoint/job (same labels,
    // half the scheduling — the connectedComponents trick).
    var i = 0
    while (i + 2 <= iters) { labels = round(round(labels)).cp(); i += 2 }
    if (i < iters) labels = round(labels).cp()
    labels
  }

  /** Strongly connected components of the DIRECTED graph — CC's
    * direction-aware sibling (a cycle is an SCC; a DAG is all
    * singletons; the mutual-reachability question implied by the
    * reference's directed MATCH surface — edge directions
    * executor/graph.go:444-453, traversal core graph_shortest.go).
    * Distributed trim + forward/backward min-label
    * coloring, the FW-BW/coloring family of the distributed-SCC
    * literature re-expressed as DataFrame loops:
    *
    *  1. TRIM: a node with no in-edge or no out-edge in the live
    *     subgraph can't sit on a cycle → singleton SCC; peel to
    *     fixpoint (each round = one degree agg + two semi-joins,
    *     |E|-bounded like kCore's peel).
    *  2. COLOR: propagate the min node id FORWARD along edges to a
    *     fixpoint (directed twin of connectedComponents' loop), and
    *     BACKWARD along reversed edges. F(v) = min over ancestors
    *     ∪ {v}, B(v) = min over descendants ∪ {v}.
    *  3. EXTRACT: F(v) = B(v) = c means c reaches v AND v reaches c
    *     → SCC(c) found (all of SCC(c) satisfies it, since members
    *     share ancestor and descendant sets). The SCC of the
    *     globally-smallest live node always extracts, so every
    *     round removes ≥ 1 SCC — termination is guaranteed, and on
    *     the dense derived graphs the giant SCC falls in round one.
    *
    * State is one (node, label) row per live vertex; every loop body
    * is map-combined aggs + co-partitioned joins, nothing wider than
    * an edge shuffles, and the only driver-side values are the
    * convergence scalars — same contract as the other graph loops.
    * Deterministic (min is order-free) → exactly reproducible by the
    * transitive-closure oracle. */
  def stronglyConnectedComponents(): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // Start from the per-instance distinct-edge checkpoint: with
    // Graph.derived memoizing instances, repeated SCC runs (and any
    // other distinct-edge consumer) share ONE materialization.
    var live = distinctCp
    var result: DataFrame = Seq.empty[(Long, Long)].toDF("node", "scc")
    // Lazy checkpoints on every state whose next driver action is a
    // full-scan scalar (count / label sum): that action's job
    // materializes the blocks — one job per step instead of two.
    // `live` keeps the EAGER cp: its next consumer is a plan that
    // references it twice (both edge ends), which would race to
    // compute an unmaterialized subtree.
    var nodes = live.select(col("src").as("node"))
      .union(live.select(col("dst").as("node"))).distinct().cpLazy()
    var nLive = nodes.count()
    while (nLive > 0) {
      // 1. trim to fixpoint. "Has both an in- and an out-edge" is ONE
      // map-combined flag aggregate over the edge ends — the earlier
      // distinct-∩-distinct spelling planned as two full aggregates
      // plus the set-op's own exchange (three shuffles per peel
      // round) for the same answer.
      var trimming = true
      while (trimming && nLive > 0) {
        val both = live.select(col("src").as("node"), lit(1).as("o"),
            lit(0).as("i"))
          .unionByName(live.select(col("dst").as("node"), lit(0).as("o"),
            lit(1).as("i")))
          .groupBy("node").agg(max("o").as("o"), max("i").as("i"))
          .filter(col("o") === 1 && col("i") === 1)
          .select("node")
        val keep = nodes.join(both, Seq("node"), "left_semi").cpLazy()
        val nKeep = keep.count()
        if (nKeep == nLive) trimming = false
        else {
          result = result.union(nodes.join(both, Seq("node"), "left_anti")
            .select(col("node"), col("node").as("scc")))
          nodes = keep
          live = live
            .join(nodes.select(col("node").as("src")), Seq("src"), "left_semi")
            .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
            .cp()
          nLive = nKeep
        }
      }
      if (nLive > 0) {
        // 2. min-label coloring, both directions
        def minReach(e: DataFrame): DataFrame = {
          def round(l: DataFrame): DataFrame =
            l.as("L").join(e.as("E"), expr("L.node = E.src"))
              .select(col("E.dst").as("node"), col("L.m").as("m"))
              .union(l)
              .groupBy("node").agg(min("m").as("m"))
          var lbl = nodes.select(col("node"), col("node").as("m"))
          var prevSum = lbl.agg(sum("m")).head().getLong(0)
          var done = false
          // Two rounds per job: min-propagation is monotone, so the
          // fixpoint (and the sum test observing every second round)
          // is unchanged — half the driver scheduling.
          while (!done) {
            val next = round(round(lbl)).cpLazy()
            val s = next.agg(sum("m")).head().getLong(0)
            done = s == prevSum; prevSum = s; lbl = next
          }
          lbl
        }
        val f = minReach(live)
        val b = minReach(live.select(col("dst").as("src"),
          col("src").as("dst")))
        val found = f.join(b.withColumnRenamed("m", "mb"), "node")
          .filter(col("m") === col("mb"))
          .select(col("node"), col("m").as("scc")).cpLazy()
        result = result.union(found)
        nodes = nodes.join(found.select("node"), Seq("node"), "left_anti")
          .cpLazy()
        // Count BEFORE the live rebuild: this one job materializes
        // found AND nodes, and live's eager cp then reads both from
        // cache (live itself references nodes twice, so it keeps the
        // eager form — see the loop-head comment).
        nLive = nodes.count()
        live = live
          .join(nodes.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .cp()
      }
    }
    result
  }

  /** k-core: the maximal subgraph where every vertex keeps at least k
    * (distinct undirected) neighbors, by iterative peeling — drop
    * all vertices below k, recompute degrees, repeat. The peel is
    * bounded at `maxRounds` WITH an early fixpoint exit, so the
    * operator's semantics are exactly reproducible by a bounded
    * unrolled oracle (extra oracle rounds past the fixpoint are
    * no-ops); callers pick maxRounds ≥ the convergence depth of
    * their data (specs assert it). State per round is the surviving
    * edge list: one map-combined degree agg + two co-partitioned
    * semi-joins, |E|-bounded — the standard distributed peel, no
    * driver-side data beyond the one convergence scalar. */
  def kCore(k: Int, maxRounds: Int): DataFrame = {
    var edges = bothCp
    var prevN = edges.select("src").distinct().count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      // Lazy checkpoint: the survivor-count job below full-scans the
      // pruned edges, materializing them in the same job (§5).
      val pruned = edges
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .cpLazy()
      val n = pruned.select("src").distinct().count()
      converged = n == prevN
      prevN = n
      edges = pruned
      rounds += 1
    }
    edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }

  /** k-truss: the maximal subgraph in which every EDGE sits in at
    * least k−2 triangles — the edge-level cohesion test beside
    * [[kCore]]'s vertex-degree test (a community that passes k-core
    * can still hang together by single bridge edges; truss demands
    * every tie be triangle-reinforced). Peel to fixpoint: per round,
    * per-edge support = |N(u) ∩ N(v)| over the CURRENT survivor set
    * (the g_triangles pairing — posting-list joins bounded by
    * Σ min-degree, no cartesian), drop edges under k−2, repeat.
    * Early exit on a stable edge count is idempotent at fixpoint, so
    * a fixed-round unrolled oracle states the same result (the
    * kCore convergence contract; the spec pins fixpoint-within-
    * bound). Output: surviving canonical edges with their final
    * support. */
  def kTruss(k: Int, maxRounds: Int, degreeCap: Int = 10000): DataFrame = {
    // Per-edge support via the shared [[Graph.edgeSupportsWith]]
    // degree-cap hybrid (see its Scaladoc for the array/wedge split
    // and the memory contract). Hubs are classified ONCE on the
    // initial graph — peeling only shrinks degrees, so under-cap
    // stays under-cap; an initial hub that later shrinks merely
    // stays on the hub path, which is correct for any degree. The
    // classification is one count agg over the checkpointed edges
    // collected to a bounded driver set (only over-cap vertices —
    // see Graph.edgeSupports), so hub-free graphs get the lean
    // array-only per-round plan with no broadcast machinery in it.
    var e = canonCp
    val spark = e.sparkSession
    import spark.implicits._
    val hubIds = Graph.hubVertices(e, degreeCap)
      .collect().map(_.getLong(0)).toSeq
    val hubs = hubIds.toDF("n")
    val hasHubs = hubIds.nonEmpty
    var prevN = e.count()
    var rounds = 0
    var converged = prevN == 0
    // At fixpoint the survivor set is unchanged, so the support
    // computed over the PRE-prune set is already the final support —
    // carry it instead of re-enumerating after the loop.
    var lastSup: Option[DataFrame] = None
    while (!converged && rounds < maxRounds) {
      // Lazy checkpoint: the kept-count below scans every support row
      // (the filter is evaluated over the full frame), so one job
      // materializes the round's supports and counts survivors.
      val sup = Graph.edgeSupportsWith(e, hubs, hasHubs).cpLazy()
      val kept = sup.filter(col("sup") >= k - 2)
      val n = kept.count()
      converged = n == prevN
      prevN = n
      e = kept.select("src", "dst")
      lastSup = Some(kept)
      rounds += 1
    }
    lastSup match {
      case Some(s) if converged => s.select("src", "dst", "sup")
      // Non-converged (maxRounds-exhausted) exit: the final recompute
      // must drop zero-support survivors — the oracle's closing wedge
      // recount is an inner join, which omits them by construction.
      case _ => Graph.edgeSupportsWith(e, hubs, hasHubs).filter(col("sup") >= 1)
        .select("src", "dst", "sup")
    }
  }

  /** TOP-K SHORTEST path enumeration, ranked by (length, path) —
    * ast.GraphPathPatternTypeTopKShortestPath semantics.
    *
    * Naive level expansion explodes combinatorially (measured: 3.9 GiB
    * of frontier at sf0.1), so two prunings keep it bounded:
    * (1) distance-to-target pruning — a reverse BFS from the target
    * yields d(v→target); any partial path with len + d > maxHops can
    * never finish in budget and is dropped before expansion (the
    * frontier only ever holds feasible prefixes of short paths);
    * (2) level early-stop — once ≥ k paths are complete, every level
    * is fully enumerated up to the current length, so no longer path
    * can enter the top-k and the loop ends. */
  def topKShortestPaths(source: Long, target: Long, k: Int,
      maxHops: Int): DataFrame =
    boundedSimplePaths(source, target, maxHops, stopAtK = Some(k)).limit(k)

  /** ALL bounded simple paths source→target with rendered path
    * strings (reference: parser/ast/graph.go:144 restores the bare
    * `ALL` path quantifier — enumerate every path, not just
    * shortest/top-k). Same machinery as top-k minus the k cut; the
    * distance-to-target prune stays EXACT for full enumeration (a
    * partial path at `len` can only reach the target within the
    * bound if `len + dist_to_target <= maxHops`). */
  def allPaths(source: Long, target: Long, maxHops: Int): DataFrame =
    boundedSimplePaths(source, target, maxHops, stopAtK = None)

  /** Distance-pruned simple-path enumeration: frontier carries
    * (node, path array, len); each level joins the edge list, drops
    * revisits (simple paths), and prunes branches that can no longer
    * reach the target within the hop bound. `stopAtK` adds the top-k
    * early exit (stop as soon as k completed paths exist — they are
    * shortest-first because enumeration is level-synchronous). */
  private def boundedSimplePaths(source: Long, target: Long, maxHops: Int,
      stopAtK: Option[Int]): DataFrame = {
    val e = orientedCp("out")
    val distToTarget = shortestDistances(target, "in", maxHops)
      .select(col("node"), col("dist").as("d_to_t"))
    var paths = e.sparkSession.range(1)
      .select(lit(source).as("node"), array(lit(source)).as("path"),
        lit(0).as("len"))
      .cp()
    // `found` stays a LAZY union of target-filters over the per-hop
    // checkpoints: each arm reads materialized rows, so giving the
    // union its own checkpoint per hop (the old shape) only added a
    // driver-synced job — with maxHops hops that is maxHops extra
    // materializations for frames the loop already holds.
    var found = paths.filter(col("node") === target)
    // Driver-side loop counters, both refreshed by ONE full-scan
    // aggregate per hop that doubles as the lazy checkpoint's
    // materialization job (the old shape paid found.count() +
    // isEmpty + an eager checkpoint — three driver-synced jobs per
    // hop — for the same two scalars). Seed state: one partial path
    // at the source, which is a completed path iff source == target.
    var foundN = if (source == target) 1L else 0L
    var pathsN = 1L
    var hopN = 0
    while (hopN < maxHops && stopAtK.forall(foundN < _) && pathsN > 0) {
      hopN += 1
      paths = paths.filter(col("node") =!= target)
        .join(e, paths("node") === e("src"))
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("node"),
          concat(col("path"), array(col("dst"))).as("path"),
          lit(hopN).as("len"))
        .join(distToTarget, "node")
        .filter(col("len") + col("d_to_t") <= maxHops)
        .drop("d_to_t")
        .cpLazy()
      val r = paths.agg(count(lit(1)),
        count(when(col("node") === target, true))).head()
      pathsN = r.getLong(0)
      foundN += r.getLong(1)
      found = found.union(paths.filter(col("node") === target))
    }
    found.select(col("len"), concat_ws("->", col("path")).as("path"))
      .orderBy(col("len"), col("path"))
  }
}

object Graph {
  /** Convergence trace of one adaptive connected-components run.
    * `cycles` = number of 2-round propagation cycles executed
    * (including the final no-change cycle that proves the fixpoint);
    * `compressFrom` = the first cycle that ran with pointer-jumping
    * label compression enabled, or -1 if the decrease-rate test
    * classified the graph as dense and compression never ran. */
  final case class CcStats(cycles: Int, compressFrom: Int)

  /** Per-JVM memo of derived Graph instances, keyed by (session,
    * semantic hash of the input plan) — the SampleStats.boundsRow
    * pattern one level up: ~30 registry entries each rebuilt the
    * SAME derived edge list (orders scan + projection + distinct)
    * before their own kernel work. The memoized instance carries a
    * CHECKPOINTED edge table, so every consumer starts from the
    * materialized |E| rows; the semantic-hash key means a different
    * source dir (different scan path) or a transformed input misses
    * the cache and builds fresh. */
  private val derivedMemo = new graft.tools.SessionMemo[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Graph]

  /** Deterministic derived graph over the driver tables (SURVEY §3):
    * no explicit edge table exists, so edges come from `orders` —
    * src = o_custkey mod 1000, dst = o_orderkey mod 1000 — giving a
    * cyclic multi-component graph the DuckDB oracle reproduces with
    * the same arithmetic. Keyed by the CANONICALIZED analyzed plan
    * (structural equality — what semanticEquals checks), not its
    * 32-bit semanticHash alone: a hash collision between two
    * different input plans must never serve the wrong checkpointed
    * graph. SessionMemo carries the session half of the key and the
    * stopped-session eviction. */
  def derived(orders: DataFrame): Graph =
    derivedMemo.get(orders.sparkSession,
      orders.queryExecution.analyzed.canonicalized)(
      Graph(orders.select((col("o_custkey") % 1000).as("src"),
          (col("o_orderkey") % 1000).as("dst"))
        .distinct().localCheckpoint()))

  /** Vertices whose degree in a canonical undirected edge set
    * (src < dst, distinct) exceeds `degreeCap` — the hub
    * classification input for [[edgeSupportsWith]]. One map-combined
    * count aggregate over the edge ends; output is tiny by
    * construction (only over-cap vertices survive the filter). */
  private[graph] def hubVertices(e: DataFrame, degreeCap: Int): DataFrame =
    e.select(col("src").as("n"))
      .union(e.select(col("dst").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .filter(col("d") > degreeCap)
      // Normalize the id type: callers collect these via getLong, and
      // the schema contract is BIGINT but nothing stops an
      // IntegerType edge list reaching the public edgeSupports.
      .select(col("n").cast("long").as("n"))

  /** Sorted-array spelling of per-edge support: join each endpoint's
    * neighbor array onto the edge and merge-walk the two arrays with
    * the codegen'd SortedIntersectCount kernel — work
    * Σ_edges deg(u)+deg(v), never the Σ deg² wedge self-join (the
    * wedge spelling measured ~2.2 s/round at sf0.1; arrays cut the
    * per-round cost to the adjacency build). */
  private def arraySupport(e: DataFrame, adj: DataFrame): DataFrame =
    e.join(adj.select(col("n").as("src"), col("nbrs").as("sn")), "src")
      .join(adj.select(col("n").as("dst"), col("nbrs").as("dn")), "dst")
      .select(col("src"), col("dst"),
        org.apache.spark.sql.GraftSqlShim.column(
          graft.functions.SortedIntersectCount(
            org.apache.spark.sql.GraftSqlShim.expr(col("sn")),
            org.apache.spark.sql.GraftSqlShim.expr(col("dn"))))
          .cast("long").as("sup"))

  /** Per-edge triangle support |N(u) ∩ N(v)| over a canonical
    * undirected edge set (`src < dst`, distinct) → `(src, dst, sup)`
    * — the shared kernel behind kTruss peeling and g_clustering's
    * per-vertex triangle fold.
    *
    * MEMORY CONTRACT: a collect_set adjacency row is one vertex's
    * whole neighborhood, so an unbounded hub would materialize an
    * unbounded row. Vertices in `hubs` are EXCLUDED from the array
    * build, and their incident edges get support from a keyed wedge
    * expansion instead: expand the non-hub endpoint's neighbors
    * (rows = deg(x), never an array) and LEFT SEMI-check the closing
    * edge — co-partitioned joins only, nothing wider than an edge
    * shuffled. Same cap family as g_jaccard_nbrs' hub handling;
    * Wave14Spec proves hub-path/array-path parity on a constructed
    * hub graph for both consumers.
    *
    * `hasHubs=false` (the common case) takes the pure array path —
    * no flag joins, no wedge pipeline in the plan, so hub-free
    * graphs pay nothing per call beyond the classification the
    * caller already did (measured: leaving the hybrid plan in place
    * unconditionally costs ~0.5 s/round at sf0.1 because the und
    * shuffles feeding the empty wedge join still run before AQE can
    * propagate the empty stage). */
  private[graft] def edgeSupportsWith(e: DataFrame, hubs: DataFrame,
      hasHubs: Boolean): DataFrame = {
    val und = undirect(e)
    if (!hasHubs) {
      val adj = und.groupBy("n")
        .agg(sort_array(collect_set(col("nbr"))).as("nbrs"))
      return arraySupport(e, adj)
    }
    val adj = und.join(broadcast(hubs), Seq("n"), "left_anti")
      .groupBy("n")
      .agg(sort_array(collect_set(col("nbr"))).as("nbrs"))
    hubbySupport(e, adj, hubs)
  }

  /** Canonical undirected doubling: each edge contributes both
    * (src→dst) and (dst→src) adjacency rows. */
  private[graft] def undirect(e: DataFrame): DataFrame =
    e.select(col("src").as("n"), col("dst").as("nbr"))
      .union(e.select(col("dst").as("n"), col("src").as("nbr")))

  /** The hub-aware half of [[edgeSupportsWith]], parameterized by a
    * prebuilt NON-HUB adjacency `(n, nbrs)`: hub-free edges score via
    * [[arraySupport]]; hub-incident edges via keyed wedge expansion
    * from the lower-degree endpoint (rows = deg(x), never an array)
    * with a LEFT SEMI closing-edge check — co-partitioned joins only,
    * nothing wider than an edge shuffled. */
  private def hubbySupport(e: DataFrame, adj: DataFrame,
      hubs: DataFrame): DataFrame = {
    val und = undirect(e)
    val big = broadcast(hubs)
    val flagged = e
      .join(big.select(col("n").as("src"), lit(true).as("sb")),
        Seq("src"), "left")
      .join(big.select(col("n").as("dst"), lit(true).as("db")),
        Seq("dst"), "left")
    val small = flagged.filter(col("sb").isNull && col("db").isNull)
      .select("src", "dst")
    // Hub-incident edges: expand from the non-hub endpoint when
    // exactly one end is a hub (deg ≤ cap there), else from src.
    val hubEdges = flagged
      .filter(col("sb").isNotNull || col("db").isNotNull)
      .select(col("src"), col("dst"),
        when(col("sb").isNotNull && col("db").isNull, col("dst"))
          .otherwise(col("src")).as("x"),
        when(col("sb").isNotNull && col("db").isNull, col("src"))
          .otherwise(col("dst")).as("y"))
    val wedges = hubEdges
      .join(und.select(col("n").as("x"), col("nbr").as("w")), "x")
      .join(und.select(col("n").as("y"), col("nbr").as("w")),
        Seq("y", "w"), "left_semi")
      .groupBy("src", "dst")
      .agg(count(lit(1)).cast("long").as("sup"))
    val hubSup = hubEdges.select("src", "dst")
      .join(wedges, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("sup"), lit(0L)).as("sup"))
    arraySupport(small, adj).unionByName(hubSup)
  }

  /** ONE-exchange adjacency card over a canonical undirected edge set:
    * `(n, deg, nbrs)` where `nbrs` is the sorted neighbor array iff
    * deg ≤ cap, else NULL. Memory-bounded by construction — the
    * [[graft.functions.BoundedCollectSet]] buffer never holds more
    * than cap+1 longs even while scanning an unbounded hub — so this
    * single aggregate safely serves hub CLASSIFICATION
    * (`nbrs IS NULL` ⇔ over-cap), per-vertex DEGREE output, and the
    * adjacency ARRAYS the support kernel consumes. Replaces the
    * count-agg + collect_set-agg pair (two |2E| exchanges over the
    * same undirected edge set) that g_clustering paid through r11. */
  private[graft] def adjacencyCapped(e: DataFrame, cap: Int): DataFrame =
    undirect(e).groupBy("n").agg(
      count(lit(1)).as("deg"),
      graft.functions.BoundedCollectSet
        .col(col("nbr").cast("long"), cap).as("nbrs"))

  /** Per-edge support from a prebuilt [[adjacencyCapped]] frame (the
    * caller should localCheckpoint `adj` — classification already
    * scanned it). Hub-free (the common case): pure array path
    * reusing `adj`, zero extra adjacency exchanges. With hubs: the
    * same wedge-expansion hybrid as [[edgeSupportsWith]], arrays for
    * non-hub rows taken from `adj` as-is (a non-hub's array may
    * CONTAIN hub ids — that's correct; only rows keyed BY a hub are
    * unusable, and those are exactly the NULL rows). */
  private[graft] def edgeSupportsFromAdj(e: DataFrame, adj: DataFrame,
      hubIds: Seq[Long]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    if (hubIds.isEmpty) arraySupport(e, adj.select("n", "nbrs"))
    else hubbySupport(e,
      adj.filter(col("nbrs").isNotNull).select("n", "nbrs"),
      hubIds.toDF("n"))
  }

  /** CORENESS decomposition — every vertex's k-core number in one
    * pass family (vs [[Graph.kCore]]'s fixed-k subgraph): the h-index
    * fixpoint iteration (Lü, Zhou, Zhang & Stanley 2016 — c₀ = deg;
    * c_{t+1}(v) = h-index of {c_t(u) : u ∈ N(v)}; converges to the
    * exact coreness monotonically from above, and is IDEMPOTENT at
    * the fixpoint, so a fixed-round unrolled oracle states the same
    * result — the kCore/kTruss convergence contract). Per round: one
    * window over the undirected edge ends (rank neighbors by current
    * estimate) + one map-combined max(least(rank, c)) aggregate —
    * nothing wider than an edge shuffles, no adjacency arrays at all,
    * so coreness is hub-safe WITHOUT the degree-cap machinery. Early
    * exit on a stable estimate count (one driver scalar per round,
    * the graph-loop convention). Input: canonical undirected edges
    * (src < dst, distinct, no self-loops); output (n, deg, coreness). */
  private[graft] def coreness(e: DataFrame, maxRounds: Int): DataFrame = {
    // NOT pre-partitioned on the join key: the |V|-row estimate frame
    // is the join's build side (AQE broadcasts it at these sizes, and
    // at cluster scale EnsureRequirements shuffles the smaller side),
    // so an upfront repartition of the 2|E| rows is paid once and
    // saves nothing per round — measured as a mild regression.
    val und = undirect(e).localCheckpoint()
    var c = und.groupBy("n").agg(count(lit(1)).as("c")).localCheckpoint()
    val degs = c.select(col("n"), col("c").as("deg"))
    // h-index without ranking the raw edge ends: h = max over the
    // OBSERVED estimate values c of min(c, |{u : c(u) ≥ c}|) — the
    // standard identity (taking c = the h-th largest value attains
    // h; no value exceeds it). So the |2E|-row pass is a
    // map-COMBINED (n, c)-count whose shuffle carries only the
    // distinct estimate values per vertex; the suffix counts + fold
    // then run INSIDE one aggregate over each vertex's tiny
    // (estimate, count) list — a per-vertex array sort + fold in
    // whole-stage codegen, replacing the old full-frame window
    // (Exchange + Sort + Window + second aggregate) per round.
    def round(cur: DataFrame): DataFrame = und
      .join(cur.select(col("n").as("nbr"), col("c")), "nbr")
      .groupBy("n", "c").agg(count(lit(1)).as("k"))
      .groupBy("n").agg(collect_list(struct(col("c"), col("k"))).as("cks"))
      .select(col("n"), expr(
        """aggregate(
             array_sort(cks, (l, r) -> CASE WHEN l.c > r.c THEN -1
                                            WHEN l.c < r.c THEN 1
                                            ELSE 0 END),
             struct(CAST(0 AS BIGINT) AS ge, CAST(0 AS BIGINT) AS best),
             (a, x) -> struct(a.ge + x.k,
                              GREATEST(a.best, LEAST(x.c, a.ge + x.k))),
             a -> a.best)""").as("c"))
    // Estimates are positive and per-vertex MONOTONE NON-INCREASING,
    // so Σc strictly decreases until the fixpoint — one cheap scalar
    // aggregate per materialization instead of a join/diff against
    // the previous state, and TWO rounds chain per job/checkpoint
    // (the connectedComponents trick: the fixpoint is idempotent, so
    // an extra round past convergence changes nothing while halving
    // the driver scheduling on the way there — the loop's cost at
    // this graph size IS the materialization count).
    // SUM over zero rows is NULL — fold it to 0 so an empty edge set
    // converges on the first check instead of NPE-ing.
    def estSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("c"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var rounds = 0
    var prevSum = estSum(c)
    var converged = false
    // Chain TWO h-index rounds per materialization — the fixpoint is
    // idempotent, so an extra round past convergence changes nothing
    // while the loop's cost at this graph size IS the
    // materialization count (the r17 A/B measured FOUR-round chaining
    // as no further gain, so two is the shipped budget unit). The
    // budget floor keeps tiny maxRounds
    // refining instead of returning raw degrees as "coreness", and
    // round-down stays the safe direction: an UNDER-run past the
    // converged gate only happens pre-fixpoint where the estimates
    // are still upper bounds either way.
    val budget = math.max(maxRounds - maxRounds % 2, 2)
    while (!converged && rounds + 2 <= budget) {
      // Lazy checkpoint: estSum's aggregate job materializes the
      // round's estimates — one job per cycle instead of two (§5).
      val next = round(round(c)).localCheckpoint(false)
      val nextSum = estSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      c = next
      rounds += 2
    }
    degs.join(c.withColumnRenamed("c", "coreness"), "n")
  }

  /** One-shot per-edge support: ONE bounded adjacency exchange serves
    * both the hub classification and the array build. The
    * classification collect is a bounded driver scalar set (only
    * over-cap vertices have NULL arrays; even a hub-heavy web graph
    * yields thousands of rows, not |V|), so the common hub-free case
    * selects the lean array-only plan with no broadcast machinery
    * left in it. */
  def edgeSupports(e: DataFrame, degreeCap: Int = 10000): DataFrame = {
    val adj = adjacencyCapped(e, degreeCap).localCheckpoint()
    val hubIds = adj.filter(col("nbrs").isNull)
      .select(col("n").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    edgeSupportsFromAdj(e, adj.select("n", "nbrs"), hubIds)
  }
}
