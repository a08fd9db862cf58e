package graft

import graft.functions.VectorFns._
import org.apache.spark.sql.functions._

class PipelineWaveSpec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  test("d_dedup_url: keeps the best fetch per canonical URL") {
    val rows = q("d_dedup_url").collect()
    val docs = t.documents
      .select(col("doc_id"), col("n_chars"),
        concat(lit("https://"), col("source"), lit(".example.com/item/"),
          col("doc_id") % 120).as("canon_url"))
      .collect()
      .map(r => (r.getAs[String]("canon_url"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars")))
      .groupBy(_._1)
    assert(rows.length == docs.size)
    assert(rows.map(_.getAs[Long]("n_fetches")).sum == docs.values.map(_.size).sum)
    rows.foreach { r =>
      val grp = docs(r.getAs[String]("canon_url"))
      // keep-best: max n_chars, tie-broken to the LOWEST doc_id.
      val best = grp.maxBy(g => (g._3, -g._2))
      assert(r.getAs[Long]("keep_id") == best._2)
      assert(r.getAs[Long]("best_chars") == best._3)
      assert(r.getAs[Long]("n_fetches") == grp.size)
    }
  }

  test("t_dataset_card: shares sum to 1 and totals reconcile") {
    val rows = q("t_dataset_card").collect()
    val total = t.documents.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val shareSum = rows.map(_.getAs[Double]("corpus_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Double]("pct_short") >= 0 &&
        r.getAs[Double]("pct_short") <= 1)
      assert(r.getAs[Long]("total_tokens") > 0)
      assert(r.getAs[Double]("p50_chars") > 0)
    }
  }

  test("s_hybrid_rrf: fuses both legs with the RRF formula") {
    val rows = q("s_hybrid_rrf").collect()
    assert(rows.length == 10)
    var last = Double.MaxValue
    rows.sortBy(_.getAs[Int]("rn")).foreach { r =>
      val rt = Option(r.getAs[Any]("r_text")).map(_.asInstanceOf[Int])
      val rv = Option(r.getAs[Any]("r_vec")).map(_.asInstanceOf[Int])
      // At least one leg ranked every fused row, and the rrf value is
      // exactly the sum of the legs' reciprocal ranks.
      assert(rt.nonEmpty || rv.nonEmpty)
      val expect = rt.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
      assert(r.getAs[Double]("rrf") <= last + 1e-12)
      last = r.getAs[Double]("rrf")
    }
    // A doc ranked top in BOTH legs beats any single-leg doc: the
    // max possible single-leg rrf is 1/61 < 1/61 + 1/80.
    val both = rows.filter(r => r.getAs[Any]("r_text") != null &&
      r.getAs[Any]("r_vec") != null)
    val single = rows.filter(r => r.getAs[Any]("r_text") == null ||
      r.getAs[Any]("r_vec") == null)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getAs[Double]("rrf")).max >
        single.map(_.getAs[Double]("rrf")).min)
  }

  test("d_fuzzy_join: pairs share a block and true edit distance") {
    val rows = q("d_fuzzy_join").collect()
    assert(rows.nonEmpty)
    val titles = t.documents
      .select(col("doc_id"),
        substring(graft.functions.TextFns.normalize(col("text")), 1, 24)
          .as("title"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("title")).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { r =>
      val (t1, t2) = (titles(r.getAs[Long]("id1")),
        titles(r.getAs[Long]("id2")))
      assert(t1.take(8) == t2.take(8), "pair crosses a block")
      assert(r.getAs[Int]("lev") == lev(t1, t2))
      assert(r.getAs[Int]("lev") <= 8)
    }
    // The threshold catches genuinely-near (non-identical) pairs too.
    assert(rows.exists(_.getAs[Int]("lev") > 0))
  }

  test("d_dedup_semantic: sound pairs, co-clustered, real recall") {
    val sem = q("d_dedup_semantic").collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Double]("cos")))
    assert(sem.nonEmpty)
    // Soundness: every reported pair really clears the threshold on
    // the exact all-pairs oracle entry (subset property).
    val exact = q("d_dedup_embed").collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        r.getAs[Double]("cos")).toMap
    sem.foreach { case (a, b, c) =>
      assert(exact.contains((a, b)),
        s"semantic pair ($a,$b) not in the exact thresholded set")
      assert(math.abs(exact((a, b)) - c) < 1e-9)
    }
    // Recall: cluster-scoping keeps a substantial share of the true
    // pairs (SemDeDup's trade — measured, not assumed).
    val recall = sem.length.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall collapsed")
  }

  test("t_code_detect: injected code docs flag, plain prose does not") {
    val rows = q("t_code_detect").collect()
    assert(rows.length == t.documents.count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 7 == 0) {
        // The injected payload carries braces + >=2 keywords.
        assert(r.getAs[Int]("is_code") == 1, s"code doc $id not flagged")
        assert(r.getAs[Int]("kw_hits") >= 2)
      }
    }
    // The detector discriminates: not everything is code.
    assert(rows.exists(_.getAs[Int]("is_code") == 0))
  }

  test("s_ann_filtered: neighbors all satisfy the predicate, exact in-slice") {
    val rows = q("s_ann_filtered").collect()
    assert(rows.length == 25) // 5 queries × top-5
    assert(rows.forall(r => Set(2, 3).contains(r.getAs[Int]("label"))))
    // Exactness within the slice: the top-1 for query 0 beats every
    // other in-slice candidate (spot-check against a recompute).
    val e = t.embeddings.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("label"), r.getAs[Seq[Float]]("embedding").toArray))
      .toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val qv = e(0L)._2
    val best = e.filter { case (id, (l, _)) => id != 0L && (l == 2 || l == 3) }
      .map { case (id, (_, v)) => id -> cos(qv, v) }
      .maxBy { case (id, c) => (math.rint(c * 1e8) / 1e8, -id) }
    assert(rows.filter(_.getAs[Long]("qid") == 0L)
      .map(_.getAs[Long]("vec_id")).contains(best._1))
  }

  test("d_dup_stats: per-source rates reconcile with raw fingerprints") {
    val rows = q("d_dup_stats").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == t.documents.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dups") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_distinct"))
      assert(r.getAs[Double]("dup_share") >= 0 &&
        r.getAs[Double]("dup_share") < 1)
    }
    val src = rows.head.getAs[String]("source")
    val docs = t.documents.filter(col("source") === src)
    assert(rows.find(_.getAs[String]("source") == src).get
      .getAs[Long]("n_distinct") ==
      docs.select(md5(col("text").cast("binary"))).distinct().count())
  }

  test("t_ngram_freq: top bigram count matches a recount") {
    val rows = q("t_ngram_freq").collect()
    assert(rows.length == 20)
    val top = rows.maxBy(_.getAs[Long]("n"))
    val Array(w1, w2) = top.getAs[String]("bigram").split(" ")
    val recount = t.documents
      .select(split(graft.functions.TextFns.normalize(col("text")), " ")
        .as("ws"))
      .collect().map { r =>
        val ws = r.getSeq[String](0)
        ws.sliding(2).count(p => p.length == 2 && p(0) == w1 && p(1) == w2)
      }.sum
    assert(top.getAs[Long]("n") == recount)
    // Descending, total order.
    val ns = rows.sortBy(_.getAs[String]("bigram")).map(_.getAs[Long]("n"))
    assert(rows.map(_.getAs[Long]("n")).max == ns.max)
  }

  test("g_degree_dist: distribution reconciles with the edge list") {
    val rows = q("g_degree_dist").collect()
    val e = graph.Graph.derived(t.orders).oriented("out")
    assert(rows.map(r =>
      r.getAs[Int]("out_deg").toLong * r.getAs[Long]("n_vertices")).sum ==
      e.count())
    assert(rows.map(_.getAs[Long]("n_vertices")).sum ==
      e.select("src").distinct().count())
  }

  test("s_kmeans: partitions the corpus, deterministic, inertia improves") {
    val card = q("s_kmeans").collect()
    assert(card.map(_.getAs[Long]("n")).sum == t.embeddings.count())
    assert(card.length > 1 && card.length <= 8)
    // Deterministic: a second full run yields the identical card.
    val again = q("s_kmeans").collect()
    assert(card.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // Lloyd monotonicity: 3 iterations never beat-by-losing — total
    // inertia at iters=3 is <= the iters=1 total (equal only if
    // converged after 1).
    def inertia(iters: Int): Double = {
      val corpus = t.embeddings
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val (cells, cents) = graft.ann.IvfIndex.build(corpus, c = 8, iters)
      cells.join(broadcast(cents.withColumn("cc", dot(col("cv"), col("cv")))),
          "cell")
        .select((dot(col("v"), col("v"))
          - lit(2.0) * dot(col("v"), col("cv")) + col("cc")).as("d2"))
        .agg(sum("d2")).head.getDouble(0)
    }
    assert(inertia(3) <= inertia(1) + 1e-6)
  }
}
