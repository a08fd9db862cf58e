package graft

import graft.functions.UserVars
import graft.operators.SampleStats
import graft.tools.{StatementsSummary, Trace}
import org.apache.spark.sql.functions._

class Wave14Spec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  // --- user variables (builtin_other.go setVar/getVar contract) ---

  test("UserVars: names case-insensitive, unset reads NULL") {
    UserVars.clear(spark)
    assert(UserVars.get(spark, "nope").isEmpty)
    // Unset @var reads as NULL (MySQL GET of undefined).
    val r0 = t.orders.limit(1)
      .select(UserVars.read(spark, "nope").as("v")).head()
    assert(r0.isNullAt(0))
    UserVars.set(spark, "MyVar", 42L)
    assert(UserVars.get(spark, "myvar").contains(42L))
    assert(UserVars.get(spark, "MYVAR").contains(42L))
    UserVars.clear(spark)
  }

  test("UserVars: store is session-scoped like sessionVars.Users") {
    UserVars.clear(spark)
    UserVars.set(spark, "mine", 7L)
    val other = spark.newSession()
    assert(UserVars.get(other, "mine").isEmpty,
      "user variable leaked across sessions")
    UserVars.set(other, "mine", 8L)
    assert(UserVars.get(spark, "mine").contains(7L))
    UserVars.clear(spark)
    UserVars.clear(other)
  }

  test("q_func_uservar: assigned @cut equals the recomputed scalar") {
    val rows = q("q_func_uservar").collect()
    assert(rows.nonEmpty)
    val expectedCut = t.orders.agg(
      (max(operators.Exact.dec2(col("o_totalprice"))).cast("double") * 0.5)
        .as("v")).head().getDouble(0)
    // Every output row renders the SAME session-var value, and it is
    // the assigned scalar (rounded the way the entry rounds it).
    val cuts = rows.map(_.getAs[Double]("cut_value")).distinct
    assert(cuts.length == 1 &&
      math.abs(cuts.head - math.round(expectedCut * 100) / 100.0) < 1e-9)
  }

  // --- statements summary (stmtsummary / infoschema render) ---

  test("statements_summary equals an independent trace of the workload") {
    val df = q("q_statements_summary")
    val rows = df.collect()
    // exec_count: q_scan_filter ran twice, q_sort_topn once.
    val byEntry = rows.groupBy(_.getAs[String]("entry"))
    assert(byEntry("q_scan_filter")
      .forall(_.getAs[Long]("exec_count") == 2L))
    assert(byEntry("q_sort_topn")
      .forall(_.getAs[Long]("exec_count") == 1L))
    // The table's per-operator rows_total must equal an INDEPENDENT
    // trace aggregation: 2× scan_filter + 1× sort_topn.
    def traced(name: String): Map[String, Long] =
      Trace.run(name, t).groupBy(_.name)
        .map { case (op, ns) => op -> ns.flatMap(_.rowsOut).sum }
    val expect = (traced("q_scan_filter").toSeq.map {
      case (op, n) => (("q_scan_filter", op), 2 * n)
    } ++ traced("q_sort_topn").toSeq.map {
      case (op, n) => (("q_sort_topn", op), n)
    }).toMap
    val got = rows.map(r => ((r.getAs[String]("entry"),
      r.getAs[String]("op")), r.getAs[Long]("rows_total"))).toMap
    assert(got == expect,
      s"summary drifted from trace:\ngot    $got\nexpect $expect")
    // The information_schema read path: the temp view serves the
    // same rows the entry returned.
    val viaView = spark.table("statements_summary").count()
    assert(viaView == rows.length)
  }

  test("statements history: rotation survives clear() and folds windows") {
    val dir = java.nio.file.Files.createTempDirectory("stmthist")
      .toString
    StatementsSummary.clear()
    StatementsSummary.record("q_scan_filter", t)
    StatementsSummary.record("q_scan_filter", t)
    StatementsSummary.record("q_sort_topn", t)
    def detCols(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[String]("entry"), r.getAs[String]("op"),
        r.getAs[Long]("exec_count"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("rows_total"))).toSet
    val inMem = detCols(StatementsSummary.summary(spark).collect())
    StatementsSummary.persistRotate(spark, dir)
    // Rotation clears the live window (stmtsummary window reset)...
    assert(StatementsSummary.summary(spark).collect().isEmpty)
    // ...but the re-read history equals the summary it rotated out.
    assert(detCols(StatementsSummary.history(spark, dir).collect())
      == inMem, "re-read history diverged from the rotated summary")
    // A second window accumulates per-digest exec counts across
    // batches instead of overwriting them.
    StatementsSummary.record("q_scan_filter", t)
    StatementsSummary.persistRotate(spark, dir)
    val hist = StatementsSummary.history(spark, dir).collect()
    val scanRows = hist.filter(_.getAs[String]("entry") == "q_scan_filter")
    assert(scanRows.nonEmpty &&
      scanRows.forall(_.getAs[Long]("exec_count") == 3L))
    assert(scanRows.forall(_.getAs[Long]("n_batches") == 2L))
    val topnRows = hist.filter(_.getAs[String]("entry") == "q_sort_topn")
    assert(topnRows.nonEmpty &&
      topnRows.forall(_.getAs[Long]("exec_count") == 1L) &&
      topnRows.forall(_.getAs[Long]("n_batches") == 1L))
    // Slow-view threshold fences (slow_query.go): 0 ms admits every
    // digest, an impossible threshold admits none.
    assert(StatementsSummary.slowView(spark, dir, 0.0).count() ==
      hist.length)
    assert(StatementsSummary.slowView(spark, dir, 1e12).count() == 0)
    // Content-keyed batches: re-rotating an identical window
    // overwrites its own batch — history row set unchanged.
    StatementsSummary.record("q_scan_filter", t)
    StatementsSummary.persistRotate(spark, dir)
    assert(detCols(StatementsSummary.history(spark, dir).collect())
      == detCols(hist))
    // windowId opts OUT of the lossy collapse: the same window content
    // under two DISTINCT window ids keeps two batches (exec counts
    // accumulate), while a re-record of the SAME id stays idempotent.
    val before = StatementsSummary.history(spark, dir)
      .filter(col("entry") === "q_scan_filter")
      .collect().head.getAs[Long]("exec_count")
    StatementsSummary.record("q_scan_filter", t)
    val k1 = StatementsSummary.persistRotate(spark, dir, Some("w1"))
    StatementsSummary.record("q_scan_filter", t)
    val k2 = StatementsSummary.persistRotate(spark, dir, Some("w2"))
    assert(k1 != k2, "distinct window ids must key distinct batches")
    def scanExecs() = StatementsSummary.history(spark, dir)
      .filter(col("entry") === "q_scan_filter")
      .collect().head.getAs[Long]("exec_count")
    assert(scanExecs() == before + 2)
    StatementsSummary.record("q_scan_filter", t)
    val k1again = StatementsSummary.persistRotate(spark, dir, Some("w1"))
    assert(k1again == k1 && scanExecs() == before + 2,
      "same-window-id re-record must overwrite, not duplicate")
    StatementsSummary.clear()
  }

  test("q_selectivity: interpolation estimate ties out and is accurate") {
    val row = q("q_selectivity").collect().head
    val c = 150000.0
    // Recompute from the raw values: exact bucket fold with the same
    // calcFraction interpolation.
    val vs = t.orders.select(operators.SampleStats.price.as("v"))
      .collect().map(_.getDouble(0)).sorted
    val actual = vs.count(_ <= c).toLong
    assert(row.getAs[Long]("actual_rows") == actual)
    // Equi-depth + linear interpolation on a smooth-ish distribution:
    // the estimate must land within 5% of the truth (the estimator's
    // fitness, not just its arithmetic).
    assert(row.getAs[Double]("rel_err") <= 0.05,
      s"histogram estimate off by ${row.getAs[Double]("rel_err")}")
    assert(math.abs(row.getAs[Double]("est_rows") - actual) <=
      0.05 * actual + 1)
  }

  test("q_stats_correlation matches a brute-force rank recompute") {
    val row = q("q_stats_correlation").collect().head
    // Brute force: collect the same bounded sample, rank by handle
    // and by (value, handle), Pearson over the rank pairs via the
    // same closed form (builder.go:190 calcCorrelation).
    val sample = SampleStats.sampledOrders(t)
      .select(col("o_orderkey"), SampleStats.price.as("v"),
        functions.TextFns.knuthCoin(col("o_orderkey")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(r => (r._3, r._1)).take(10000)
    val n = sample.length.toLong
    val byHandle = sample.map(_._1).sorted.zipWithIndex.toMap
    val byValue = sample.sortBy(r => (r._2, r._1)).map(_._1)
      .zipWithIndex.toMap
    val sxy = sample.map(r =>
      byHandle(r._1).toLong * byValue(r._1)).sum
    val sx = n * (n - 1) / 2
    val sx2 = (n - 1) * n * (2 * n - 1) / 6
    val corr = (n * sxy - sx * sx).toDouble / (n * sx2 - sx * sx)
    assert(row.getAs[Long]("n_samples") == n)
    assert(math.abs(row.getAs[Double]("order_corr") -
      math.round(corr * 1e6) / 1e6) < 1e-9)
    // The partition-less rank windows are legitimate ONLY because
    // their input is constant-bounded: the plan must carry the
    // 10000-row limit under the window.
    val plan = Registry.all.find(_.name == "q_stats_correlation").get
      .run(t).queryExecution.optimizedPlan.toString
    assert(plan.contains("GlobalLimit") && plan.contains("10000"),
      s"rank window input is not limit-bounded:\n$plan")
  }

  // --- sample-built ANALYZE (row_sampler.go + builder.go) ---

  test("q_analyze_sample: correction arithmetic ties out") {
    val rows = q("q_analyze_sample").collect()
    assert(rows.length == 8, s"expected 8 equi-depth buckets, " +
      s"got ${rows.length}")
    val nFull = t.orders.count()
    val nSample = rows.map(_.getAs[Long]("n_sample")).sum
    val sf = nFull.toDouble / nSample
    // Duj1 table-NDV estimate (Haas & Stokes 1998) recomputed from
    // the sample's value-frequency profile — the entry must state
    // n·d / (n − f1 + f1·n/N) exactly, with NO full-scan distinct.
    val freqs = SampleStats.sampledOrders(t)
      .select(SampleStats.price.as("v")).collect()
      .map(_.getDouble(0)).groupBy(identity).map(_._2.length).toSeq
    val d = freqs.size
    val f1 = freqs.count(_ == 1)
    val n = freqs.sum
    val duj1 = n.toDouble * d / (n - f1 + f1.toDouble * n / nFull)
    rows.foreach { r =>
      // est_rows = n_sample · sampleFactor (builder.go:145; rounded
      // to 4dp by the entry, so compare within rounding tolerance).
      assert(math.abs(r.getAs[Double]("est_rows") -
        r.getAs[Long]("n_sample") * sf) < 1e-3)
      // repeat cap: ndvFactor ≤ sampleFactor (builder.go:147), with
      // the ndv input now the sample-derived Duj1 estimate.
      assert(r.getAs[Double]("repeat_est") <= sf + 1e-9)
      assert(math.abs(r.getAs[Double]("ndv_table_est") - duj1) < 1e-3)
      assert(math.abs(r.getAs[Double]("repeat_est") -
        math.min(nFull / duj1, sf)) < 1e-3)
      assert(math.abs(r.getAs[Double]("sample_factor") - sf) < 1e-5)
    }
    // Equi-depth on the sample: bucket sample counts within 2× of
    // each other bar the tie-splitting remainder.
    val counts = rows.map(_.getAs[Long]("n_sample"))
    assert(counts.min > 0)
  }

  test("sample-built boundaries stay close to full-scan boundaries") {
    // The q_stats_histogram scale mode: boundaries from ANALYZE's
    // sample instead of the full table. Bounded drift is the whole
    // deal — assert each sampled boundary lands within 10% of the
    // full-scan value RANGE of its exact counterpart.
    val full = SampleStats.priceBounds(t.orders).head()
    val samp = SampleStats.priceBounds(
      SampleStats.sampledOrders(t)).head()
    val qs = SampleStats.Quantiles.indices
    val lo = full.getAs[Double]("b0")
    val hi = full.getAs[Double](s"b${qs.last}")
    val range = hi - lo
    assert(range > 0)
    qs.foreach { i =>
      val drift = math.abs(samp.getAs[Double](s"b$i") -
        full.getAs[Double](s"b$i"))
      assert(drift <= 0.10 * range,
        s"boundary b$i drifted $drift (> 10% of range $range)")
    }
    // And the sample is genuinely a sample: ~20% ± 5pp of rows.
    val rate = SampleStats.sampledOrders(t).count().toDouble /
      t.orders.count()
    assert(rate > 0.15 && rate < 0.25, s"sample rate $rate off 0.2")
  }

  test("q_memtable_info renders live session facts, not constants") {
    val rows = q("q_memtable_info").collect()
    assert(rows.length == 16)
    val byKey = rows.map(r => ((r.getString(0), r.getString(1)),
      r.getString(2))).toMap
    // Derived from THIS session, recomputed independently here.
    assert(byKey(("version", "spark")) ==
      spark.version.split("\\.").take(2).mkString("."))
    assert(byKey(("runtime", "utc_session")) == "true")
    assert(byKey(("runtime", "sql_extensions")) ==
      "graft.plans.GraftExtensions")
    // Loaded column counts equal the reader-boundary schemas (events
    // counted after ts normalization).
    assert(byKey(("table", "lineitem")) == t.lineitem.schema.size.toString)
    assert(byKey(("table", "events")) == t.events.schema.size.toString)
    assert(byKey(("table", "region")) == t.region.schema.size.toString)
  }

  test("q_inspection rules are evaluated against the live session") {
    val rows = q("q_inspection").collect()
    assert(rows.length == 14)
    val byItem = rows.map(r => (r.getString(1),
      (r.getString(2), r.getString(3)))).toMap
    // Data rules recomputed independently: every table non-empty
    // with the actual count in the detail.
    Seq("region" -> t.region, "lineitem" -> t.lineitem,
      "documents" -> t.documents).foreach { case (n, df) =>
      assert(byItem(s"${n}_nonempty") == (("ok", s"rows=${df.count()}")))
    }
    assert(byItem("utc_session") == (("ok", "true")))
    // The config rule is DERIVED, not a constant: this TEST session
    // deliberately runs shuffle.partitions=8 on local[4], so the
    // cores rule must flag the mismatch here (the Verify/Bench
    // sessions set partitions == cores and render 'ok', which is
    // what the oracle pins).
    assert(byItem("shuffle_partitions_match_cores") ==
      (("warn", "mismatch")))
  }

  // --- placement card ---

  test("q_show_placement derives policies from the builder constants") {
    val rows = q("q_show_placement").collect()
    assert(rows.length == 4)
    val hashRow = rows.find(
      _.getAs[String]("target") == "TABLE orders_custhash").get
    assert(hashRow.getAs[String]("placement")
      .endsWith(s"PARTITIONS ${sources.PartitionedFact.HashBuckets}"))
    val listRow = rows.find(
      _.getAs[String]("target") == "TABLE orders_prioritylist").get
    sources.PartitionedFact.PriorityLists.values.toSeq.distinct.foreach {
      p => assert(listRow.getAs[String]("placement").contains(p))
    }
    assert(rows.forall(
      _.getAs[String]("scheduling_state") == "SCHEDULED"))
  }

  // --- mixed-direction MATCH ---

  test("g_match_mixed equals the brute-force co-reference wedge") {
    val got = q("g_match_mixed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_b")))
      .toSet
    // Brute force: materialize the raw edge list locally (sf0.001 —
    // bounded) and enumerate (a→b, c→b) pairs directly.
    val edges = graph.Graph.derived(t.orders).edges
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDst = edges.groupBy(_._2)
    val expect = byDst.toSeq.flatMap { case (b, ins) =>
      val inSeq = ins.toSeq
      for {
        (a, _) <- inSeq if a < 100 && a != b
        (c, _) <- inSeq if c != a && c != b
      } yield (a, c)
    }.groupBy(identity)
      .map { case ((a, c), g) => (a, c, g.size.toLong) }.toSet
    assert(got == expect)
  }

  test("kTruss degreeCap hub path matches the array path exactly") {
    import spark.implicits._
    // Constructed hub graph: hub 0 — {1..30} star, a leaf ring
    // (triangles only THROUGH the hub), and a detached 4-clique.
    // 4-truss: ring edges have support 1 (peeled round 1), star
    // edges then drop to 0 (peeled round 2) — multi-round peeling
    // with every wedge passing through the hub — and only the
    // clique (support 2 everywhere) survives.
    val star = (1L to 30L).map(i => (0L, i))
    val ring = (1L to 29L).map(i => (i, i + 1))
    val clique = Seq((100L, 101L), (100L, 102L), (100L, 103L),
      (101L, 102L), (101L, 103L), (102L, 103L))
    val edges = (star ++ ring ++ clique).toDF("src", "dst")
    def result(cap: Int): Set[(Long, Long, Long)] =
      graph.Graph(edges).kTruss(k = 4, maxRounds = 10, degreeCap = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("sup")))
        .toSet
    // cap=5 puts the hub (degree 30) on the wedge-expansion path;
    // cap=10000 keeps everything on the array path.
    val hubPath = result(5)
    val arrayPath = result(10000)
    assert(hubPath == arrayPath,
      s"hub path diverged:\nhub   $hubPath\narray $arrayPath")
    assert(hubPath == clique.map { case (a, b) => (a, b, 2L) }.toSet)
  }

  test("g_clustering fold: edgeSupports hub path matches array path") {
    import spark.implicits._
    // Hub 0 star over {1..30} + a ring among the leaves + a detached
    // 4-clique: triangles exist both THROUGH the hub (star×ring
    // wedges) and away from it (clique), so the per-vertex fold must
    // agree on hub, leaf and clique vertices alike.
    val star = (1L to 30L).map(i => (0L, i))
    val ring = (1L to 29L).map(i => (i, i + 1))
    val clique = Seq((100L, 101L), (100L, 102L), (100L, 103L),
      (101L, 102L), (101L, 103L), (102L, 103L))
    val u = (star ++ ring ++ clique).toDF("src", "dst")
    // The exact g_clustering fold, parameterized by the cap.
    def lcc(cap: Int): Map[Long, (Long, Double)] = {
      val sup = graph.Graph.edgeSupports(u, degreeCap = cap)
      val degs = u.select(col("src").as("n"))
        .union(u.select(col("dst").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val tri = sup.select(col("src").as("n"), col("sup").as("c"))
        .union(sup.select(col("dst").as("n"), col("sup").as("c")))
        .groupBy("n").agg((sum(col("c")) / 2).cast("long").as("n_tri"))
      degs.filter(col("deg") >= 2).join(tri, Seq("n"), "left")
        .select(col("n"), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          round(coalesce(col("n_tri"), lit(0L)) * lit(2.0) /
            (col("deg") * (col("deg") - lit(1))), 6).as("lcc"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    }
    // cap=5 puts hub 0 (degree 30) on the wedge-expansion path;
    // cap=10000 keeps everything on the array path.
    val hubPath = lcc(5)
    val arrayPath = lcc(10000)
    assert(hubPath == arrayPath,
      s"clustering fold diverged:\nhub   $hubPath\narray $arrayPath")
    // Spot-check absolute values: hub 0 closes one triangle per ring
    // edge (29), deg 30 → lcc = 58/870; clique vertices are perfect.
    assert(hubPath(0L) == ((29L,
      math.round(29.0 * 2 / (30 * 29) * 1e6) / 1e6)))
    assert(hubPath(100L) == ((3L, 1.0)))
  }

  test("g_match_mixed: midpoint join is keyed, never a cross product") {
    val p = q("g_match_mixed").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"mixed chain lost its equi-join key:\n$p")
  }

  // --- clustering coefficient / assortativity / EWMA recomputes ---

  /** The derived undirected simple graph as adjacency sets. */
  private def undirectedAdj(): Map[Long, Set[Long]] = {
    val u = graph.Graph.derived(t.orders).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    (u.map(_._1) ++ u.map(_._2)).map { n =>
      n -> u.collect {
        case (a, b) if a == n => b
        case (a, b) if b == n => a
      }
    }.toMap
  }

  test("g_clustering matches the set-intersection brute force") {
    val adj = undirectedAdj()
    val got = q("g_clustering").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val expect = adj.collect { case (n, nbrs) if nbrs.size >= 2 =>
      // tri(v) = #{unordered neighbor pairs that are themselves
      // adjacent} — counted directly, independent of the engine's
      // per-edge support fold.
      val tri = nbrs.toSeq.combinations(2).count {
        case Seq(x, y) => adj(x).contains(y)
      }.toLong
      val deg = nbrs.size.toLong
      val lcc = BigDecimal(tri * 2.0 / (deg * (deg - 1)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      n -> ((deg, tri, lcc))
    }
    assert(got.keySet == expect.keySet)
    got.foreach { case (n, (deg, tri, lcc)) =>
      val (ed, et, el) = expect(n)
      assert(deg == ed && tri == et, s"node $n: got ($deg,$tri) want ($ed,$et)")
      assert(math.abs(lcc - el) < 5e-4, s"node $n lcc: $lcc vs $el")
    }
  }

  test("g_assortativity matches a direct Pearson recompute") {
    val adj = undirectedAdj()
    val ends = adj.toSeq.flatMap { case (n, nbrs) =>
      nbrs.toSeq.map(m => (adj(n).size.toDouble, adj(m).size.toDouble))
    }
    val n = ends.size.toDouble
    val mx = ends.map(_._1).sum / n
    val my = ends.map(_._2).sum / n
    val cov = ends.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(ends.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(ends.map(p => (p._2 - my) * (p._2 - my)).sum)
    val expect = cov / (sx * sy)
    val row = q("g_assortativity").head()
    assert(row.getLong(0) == ends.size.toLong)
    assert(math.abs(row.getDouble(1) - expect) < 5e-4,
      s"assortativity ${row.getDouble(1)} vs recomputed $expect")
  }

  test("t_ppl_bucket matches a from-raw-text tercile recompute") {
    // Independent path: normalize → bigrams → add-one bigram LM →
    // per-doc mean log-prob (6dp) → interpolated terciles → buckets.
    val texts = t.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def norm(s: String) = s.toLowerCase
      .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
    val bigrams = texts.map { case (id, tx) =>
      val s = norm(tx)
      id -> (if (s.length >= 2) (0 until s.length - 1).map(i =>
        s.substring(i, i + 2)) else Seq.empty)
    }
    val lm = bigrams.flatMap(_._2).groupBy(identity)
      .map { case (b, g) => b -> g.size.toLong }
    val total = lm.values.sum
    val v = lm.size.toLong
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp = bigrams.collect { case (id, bs) if bs.nonEmpty =>
      id -> r6(bs.map(b =>
        math.log((lm(b) + 1).toDouble / (total + v))).sum / bs.size)
    }
    val sorted = lp.map(_._2).sorted
    def quant(p: Double): Double = {
      val h = p * (sorted.length - 1)
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
    }
    val (q1, q2) = (quant(0.3333333333333333), quant(0.6666666666666666))
    val expect = lp.groupBy { case (_, x) =>
      if (x >= q2) "head" else if (x >= q1) "middle" else "tail"
    }.map { case (b, g) => b -> g.size.toLong }
    val got = q("t_ppl_bucket").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect, s"buckets $got vs recomputed $expect")
  }

  test("g_clustering plan is equi-joins only (no wedge cartesian)") {
    val p = q("g_clustering").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"clustering coefficient lost its equi-join keys:\n$p")
  }

  test("e_ewma runs ONE user-partitioned window, never a global sort") {
    val plan = q("e_ewma").queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, s"no window node:\n$plan")
    // Every window partitions on user_id — an empty partition spec
    // would be the q_keyset_page single-task pathology.
    assert(plan.contains("user_id"),
      s"window lost its user partition key:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global single-partition stage in the EWMA plan:\n$plan")
  }

  test("e_ewma matches the per-user trailing-stencil recompute") {
    val events = t.events.select("user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getDouble(3)))
    val expect = events.groupBy(_._1).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.indices.drop(9).map { i =>
        val win = (0 to 9).map(k => sorted(i - k)._4)
        val num = win.zipWithIndex
          .map { case (x, k) => x * math.pow(0.5, k) }.sum
        sorted(i)._3 -> num / 1.998046875
      }
    }
    val got = q("e_ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, v) =>
      assert(math.abs(v - expect(id)) < 5e-4, s"event $id: $v vs ${expect(id)}")
    }
  }
}
