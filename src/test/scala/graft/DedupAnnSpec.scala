package graft

import org.apache.spark.sql.functions._

class DedupAnnSpec extends SparkSpecBase {

  private def q(name: String) = Registry.all.find(_.name == name).get.run(t)

  test("exact dedup: fingerprint count equals distinct texts") {
    val nFp = q("d_dedup_exact").count()
    val nDistinct = t.documents.select("text").distinct().count()
    assert(nFp == nDistinct)
  }

  test("minhash estimate tracks exact 3-gram jaccard on candidates") {
    // For every MinHash candidate pair, the 64-perm estimate must be
    // within 0.35 of the exact char-5-gram jaccard (Chernoff at k=64
    // makes larger deviations vanishingly unlikely).
    val est = q("d_dedup_minhash")
      .select(col("id1"), col("id2"), col("est_jaccard").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(est.nonEmpty, "expected at least one near-dup candidate")
    val sets = t.documents
      .select(col("doc_id"), graft.functions.TextFns
        .charShingles(col("text"), 5).as("sh"))
      .select(col("doc_id"), array_distinct(col("sh")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    est.foreach { case ((a, b), e) =>
      val (sa, sb) = (sets(a), sets(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(e - exact) < 0.35, s"pair ($a,$b) est $e exact $exact")
    }
  }

  test("simhash kernel: ones-count majority equals the ±1 vote definition") {
    // The kernel aggregates per-bit ONES counts (2·ones >= n); the
    // defining form is the ±1 majority vote (Σ±1 >= 0). Recompute the
    // definition driver-side from the SAME token hashes and demand
    // bit-identical signatures.
    val sample = t.documents.limit(30)
    val expected = sample.select(col("doc_id"),
        graft.functions.TextFns.wordShingleHashes(col("text"), 1).as("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .collect { case (id, hs) if hs.nonEmpty =>
        id -> (0 until 64).map { i =>
          val vote = hs.map(h => if (((h >> i) & 1L) == 1L) 1L else -1L).sum
          if (vote >= 0) 1L << i else 0L
        }.sum
      }.toMap
    val got = graft.dedup.DedupQueries.simhash(sample).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("simhash near-dup pairs have hamming <= 3 and are distinct") {
    val rows = q("d_dedup_simhash").collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("hamming") <= 3)
      assert(r.getAs[Long]("id1") < r.getAs[Long]("id2"))
    }
  }

  test("brute-force ANN: 5 neighbors per query, cosine in [-1,1]") {
    val rows = q("s_ann_brute").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.values.foreach(g => assert(g.length == 5))
    rows.foreach { r =>
      val c = r.getAs[Number]("cos").doubleValue()
      assert(c >= -1.0001 && c <= 1.0001)
    }
  }

  test("LSH ANN returns candidates whose cosine matches brute-force math") {
    val lsh = q("s_ann_lsh").collect()
    assert(lsh.nonEmpty, "LSH buckets produced no candidates")
    lsh.groupBy(_.getAs[Long]("qid")).values
      .foreach(g => assert(g.length <= 3))
  }

  test("IVF ANN probes recover most of the brute-force top-3") {
    // Brute force emits top-5 per query; IVF emits top-3 — every IVF
    // hit landing in the brute top-5 means the probed cells contain
    // the true neighborhood.
    val bruteSet = q("s_ann_brute").collect().map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val ivf = q("s_ann_ivf").collect()
    assert(ivf.nonEmpty, "IVF probes produced no candidates")
    ivf.groupBy(_.getAs[Long]("qid")).values
      .foreach(g => assert(g.length <= 3))
    val hits = ivf.count(r =>
      bruteSet((r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))))
    // nprobe=4 of 16 cells: expect at least half the IVF picks to be
    // true top-5 neighbors (observed much higher; bound kept loose so
    // the spec pins behavior, not one dataset).
    assert(hits * 2 >= ivf.length,
      s"IVF recall too low: $hits of ${ivf.length}")
  }

  test("IVFPQ: residual-coded probes recover the brute-force " +
    "neighborhood") {
    val bruteSet = q("s_ann_brute").collect().map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val res = q("s_ann_ivfpq").collect()
    assert(res.nonEmpty, "IVFPQ produced no results")
    res.groupBy(_.getAs[Long]("qid")).values
      .foreach(g => assert(g.length <= 3))
    val hits = res.count(r =>
      bruteSet((r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))))
    // Residual codebooks quantize finer than raw-vector PQ (whose
    // spec bound is 1/2): expect at least 60% of IVFPQ picks to be
    // true brute top-5 neighbors (observed 27/30 at sf0.001 and
    // 26/30 at sf0.01; bound kept loose to pin behavior, not one
    // dataset).
    assert(hits * 5 >= res.length * 3,
      s"IVFPQ recall too low: $hits of ${res.length}")
  }

  test("s_knn_graph_ivf: bucket-candidate edges recover >= 0.9 of " +
    "the exact kNN graph, mutual flags exact") {
    import graft.functions.VectorFns
    val approx = q("s_knn_graph_ivf").collect()
    val aEdges = approx.map(r =>
      (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    // Exact top-3 graph over the SAME full corpus (crossJoin is fine
    // at spec scale; the entry exists so production never runs it).
    val pool = t.fan(t.embeddings)
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
      .withColumn("nv", VectorFns.norm(col("v")))
    val qs = pool.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nv").as("nq"))
    val exact = VectorFns.rerankTopK(pool.crossJoin(broadcast(qs)),
        topk = 3, dedup = false)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .toSet
    val recall = (aEdges & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF kNN-graph edge recall $recall < 0.9")
    // Mutual marking is internally exact: mutual=1 iff the reverse
    // edge is in the approximate graph.
    approx.foreach { r =>
      val rev = aEdges((r.getAs[Long]("dst"), r.getAs[Long]("src")))
      assert(r.getAs[Int]("mutual") == (if (rev) 1 else 0),
        s"mutual flag wrong for ${r}")
    }
  }

  test("TopKBuffer orders NaN first (Spark's DESC sort order) and " +
    "keeps it under contention; -0.0 ties 0.0 on id") {
    // A zero-norm vector's cosine is 0/0 = NaN; Spark's DESC sort
    // ranks NaN above every finite double, so the buffer must too —
    // the old > / == compare silently dropped NaN once size == k.
    val b = new graft.functions.TopKBuffer(2)
    b.insert(0.5, 1L, 0.0)
    b.insert(0.9, 2L, 0.0) // contested from here on
    b.insert(Double.NaN, 3L, 0.0)
    assert(b.size == 2 && b.ids(0) == 3L && b.ranks(0).isNaN &&
      b.ids(1) == 2L)
    // Spark normalizes -0.0 to 0.0 before comparing: a -0.0 rank
    // must TIE a 0.0 rank and break on id, not sort below it.
    val c = new graft.functions.TopKBuffer(1)
    c.insert(0.0, 9L, 0.0)
    c.insert(-0.0, 4L, 0.0)
    assert(c.ids(0) == 4L)
  }

  test("s_knn_beam: graph-hop search recovers the exact top-3 at " +
    "useful recall, never scans the corpus") {
    import graft.functions.VectorFns
    val got = q("s_knn_beam").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    // Exact top-3 for the same queries over the same bounded pool.
    val pool = t.fan(t.embeddings).filter(col("vec_id") < 200)
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
      .withColumn("nv", VectorFns.norm(col("v")))
    val qs = pool.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nv").as("nq"))
    val exact = VectorFns.rerankTopK(pool.crossJoin(broadcast(qs)),
        topk = 3, dedup = false)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(s"beam recall = $recall")
    // Measured 0.85 at sf0.001 with symmetric links, beam 12, 5
    // hops; bound kept below it to pin behavior, not one dataset.
    assert(recall >= 0.75, s"beam recall $recall < 0.75")
    // Every query returns exactly topk rows.
    val perQ = got.groupBy(_._1).view.mapValues(_.size)
    assert(perQ.values.forall(_ == 3))
  }

  test("rerankTopKAgg (map-side-combining TopKByRank) is row-for-row " +
    "identical to the window rerankTopK, ties included") {
    import graft.functions.VectorFns
    // Full corpus-as-queries cross pairing — the exact shape
    // s_knn_graph_ivf runs the aggregate over, plus genuine rank
    // ties (duplicate vectors exist in the synthetic corpus).
    val pool = t.fan(t.embeddings)
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
      .withColumn("nv", VectorFns.norm(col("v")))
    val qs = pool.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nv").as("nq"))
    val pairs = pool.crossJoin(broadcast(qs))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"))
    val win = VectorFns.rerankTopK(pairs, topk = 3, dedup = false)
      .collect().map(key).toSet
    val agg = VectorFns.rerankTopKAgg(pairs, topk = 3)
      .collect().map(key).toSet
    assert(win == agg,
      s"agg/window divergence: ${(win diff agg) ++ (agg diff win)}")
    // The point of the aggregate: candidate rows must NOT cross an
    // exchange — every shuffle output is the k-bounded buffer column,
    // never the raw (qid, vec_id, c) pair stream.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = VectorFns.rerankTopKAgg(pairs, topk = 3)
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "the final per-group merge shuffles")
      // (The corpus pool itself may repartition — that's input-sized.
      // What must never shuffle is the SCORED pair stream, whose
      // marker is the per-pair score column `c`.)
      exchanges.foreach { e =>
        val names = e.output.map(_.name.toLowerCase)
        assert(!names.contains("c"),
          s"scored candidate pairs crossed an exchange: ${names.mkString(",")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("d_mix_temperature flattens toward uniform, order-preserving") {
    val rows = q("d_mix_temperature").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tokens"),
        r.getAs[Double]("share_now"), r.getAs[Double]("share_temp"),
        r.getAs[Double]("upsample")))
    // Scaled shares still form a distribution.
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-2)
    // α < 1 flattens, and upsample = p^(α−1)/Z is monotone
    // DECREASING in share — so the extremes are the sound
    // invariants (the uniform-share 1/k is NOT the crossover: under
    // skew a source above 1/k can still legitimately upsample):
    // the smallest source boosts, the largest damps, because
    // Σ p·upsample = 1 forces at least one of each around the
    // crossover and monotonicity pins them to the extremes.
    val byTokens = rows.sortBy(_._2)
    assert(byTokens.head._5 >= 1.0 - 1e-9,
      s"smallest source ${byTokens.head._1} should upsample")
    assert(byTokens.last._5 <= 1.0 + 1e-9,
      s"largest source ${byTokens.last._1} should downsample")
    // Monotone: a bigger source never gets a smaller scaled share,
    // and never a larger upsample factor.
    byTokens.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 <= b._4 + 1e-9)
        assert(a._5 >= b._5 - 1e-9)
      case _ =>
    }
  }

  test("s_embed_qa flags wrong-dim, NaN and zero vectors exactly") {
    import spark.implicits._
    // Constructed pathologies through the EXACT entry kernel: a
    // healthy unit vector, a 63-dim vector, a NaN-poisoned vector
    // and an all-zero vector, one label each.
    val unit = Array.fill(64)(0.0f); unit(0) = 1.0f
    val short63 = Array.fill(63)(1.0f)
    val nan = Array.fill(64)(1.0f); nan(5) = Float.NaN
    val zero = Array.fill(64)(0.0f)
    val df = Seq((1, Option(unit.toSeq)), (2, Option(short63.toSeq)),
      (3, Option(nan.toSeq)), (4, Option(zero.toSeq)),
      (5, Option.empty[Seq[Float]]))
      .toDF("label", "embedding")
    val got = ann.AnnQueries.embedQa(df).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got(1).getAs[Long]("n_bad_dim") == 0 &&
      got(1).getAs[Long]("n_nan") == 0 &&
      got(1).getAs[Long]("n_zero") == 0 &&
      got(1).getAs[Double]("norm_avg") == 1.0)
    assert(got(2).getAs[Long]("n_bad_dim") == 1)
    assert(got(3).getAs[Long]("n_nan") == 1)
    assert(got(4).getAs[Long]("n_zero") == 1 &&
      got(4).getAs[Double]("norm_avg") == 0.0)
    // A NULL embedding is a bad-dim row with a NULL norm — counted,
    // never silently skipped (and the norm columns stay NULL).
    assert(got(5).getAs[Long]("n") == 1 &&
      got(5).getAs[Long]("n_bad_dim") == 1 &&
      got(5).getAs[Long]("n_nan") == 0 &&
      got(5).getAs[Long]("n_zero") == 0 &&
      got(5).isNullAt(got(5).fieldIndex("norm_avg")))
    // And the real corpus is clean with sane norms.
    q("s_embed_qa").collect().foreach { r =>
      assert(r.getAs[Long]("n_bad_dim") == 0 &&
        r.getAs[Long]("n_nan") == 0 && r.getAs[Long]("n_zero") == 0)
      assert(r.getAs[Double]("norm_min") > 0 &&
        r.getAs[Double]("norm_min") <= r.getAs[Double]("norm_avg") &&
        r.getAs[Double]("norm_avg") <= r.getAs[Double]("norm_max"))
    }
  }

  test("BQ ANN: packed-sign hamming prefilter recovers the exact " +
      "top-5 at useful recall") {
    // Random embeddings are BQ's WORST case (no cluster structure,
    // cosine mass concentrated near 0), so the floor is modest; the
    // kernel's exactness is already hash-proven by the oracle's
    // per-dimension sign recount — this spec pins the retrieval
    // quality story.
    val brute = q("s_ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bqRows = q("s_ann_bq").collect()
    val bq = bqRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bq & brute).size.toDouble / brute.size
    assert(recall >= 0.4, s"BQ recall $recall below floor")
    // Hamming distances are genuine bit distances in [0, 64].
    bqRows.foreach { r =>
      val h = r.getAs[Long]("ham")
      assert(h >= 0 && h <= 64)
    }
  }

  test("bloom dedup: exact parity with the un-gated join, " +
      "no false negatives, both probe outcomes exercised") {
    val res = q("d_dedup_bloom").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_dup")).toMap
    // Ground truth: plain membership of the incoming fingerprints in
    // the base set — what the oracle states.
    val fp = t.documents.select(col("doc_id"),
      md5(col("text").cast("binary")).as("fp"))
    val baseFps = fp.filter(col("doc_id") % 2 === 0)
      .select("fp").collect().map(_.getString(0)).toSet
    val truth = fp.filter(col("doc_id") % 3 === 0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        baseFps(r.getAs[String]("fp"))).toMap
    assert(res == truth, "bloom gating must not change the answer")
    // The %6 overlap guarantees true dups AND true news both exist,
    // so the bloom-negative fast path and the exact-join slow path
    // were both taken.
    assert(res.values.exists(identity) && res.values.exists(!_))
    // The probe must be Spark's codegen'd might_contain, not a Scala
    // UDF closure (the r7 verdict note): the gate stays inside
    // whole-stage codegen.
    val plan = q("d_dedup_bloom").queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe not native might_contain:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"),
      s"Scala UDF back in the bloom probe plan:\n$plan")
  }

  test("d_contamination: gram strings never cross an exchange") {
    // The r6->r7 fix: 4-grams are hashed map-side and only the
    // 16-char fingerprints shuffle. Assert on the static plan (AQE
    // off so exchanges are visible pre-execution): no shuffle's
    // output carries a raw `gram` attribute.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q("d_contamination").queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "the agg/join legs do shuffle")
      exchanges.foreach { e =>
        val names = e.output.map(_.name.toLowerCase)
        assert(!names.contains("gram"),
          s"raw gram crossed an exchange: ${names.mkString(",")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("d_dedup_admit: ticks are internally consistent, agree with " +
      "the index the gate built, and re-runs are read-only") {
    def run() = Registry.all.find(_.name == "d_dedup_admit").get
      .run(t).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("n_in"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("n_neardup"),
        r.getAs[Long]("n_indexed"), r.getAs[Long]("n_in_index")))
    val rows = run()
    assert(rows.length == 2)
    rows.foreach { case (_, nIn, nNovel, nNearDup, nIndexed, nInIdx) =>
      // The gate's arithmetic: every novel doc is either refused or
      // indexed, and the index holds exactly the indexed ones.
      assert(nNovel == nNearDup + nIndexed)
      assert(nInIdx == nIndexed)
      assert(nIn >= nNovel && nIn > 0)
    }
    // Batch 0 seeds an empty index: nothing to be near-dup OF except
    // within the batch itself; batch 1 queries batch 0's postings.
    assert(rows(0)._1 == 0L && rows(1)._1 == 1L)
    // Marker-gated staging: a second run reads the same layout.
    assert(run().toSeq == rows.toSeq)
  }

  test("s_drift_series: the staged dashboard reads back quiet-then-" +
      "burst with the generation flip recorded on the burst row") {
    val rows = Registry.all.find(_.name == "s_drift_series").get
      .run(t).collect()
    assert(rows.length == 2)
    val quiet = rows(0)
    assert(quiet.getAs[Long]("batch_id") == 0L)
    assert(quiet.getAs[String]("gen_before") == "gen_1" &&
      quiet.getAs[String]("gen_after") == "gen_1")
    assert(quiet.getAs[Int]("retrained") == 0)
    assert(quiet.getAs[Long]("mass_new") > 0)
    val burst = rows(1)
    assert(burst.getAs[String]("gen_before") == "gen_1" &&
      burst.getAs[String]("gen_after") == "gen_2")
    assert(burst.getAs[Int]("retrained") == 1)
    assert(burst.getAs[Long]("mass_flagged") * 2 >
      burst.getAs[Long]("mass_new"),
      "the burst row must record the over-gate flagged mass")
  }
}
