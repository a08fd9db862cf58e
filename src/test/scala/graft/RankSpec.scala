package graft

import org.apache.spark.sql.functions._

/** Ranking/scoring suite (t_tfidf / t_bm25 / t_quality_lr): invariants
  * recomputed from raw text plus the plan shapes that make each scale
  * (all three are also hash-oracled against DuckDB). */
class RankSpec extends SparkSpecBase {

  private def q(name: String) = Registry.all.find(_.name == name).get.run(t)

  private def toks(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", "").trim
      .split(" +").filter(_.nonEmpty).toSeq

  test("tfidf: rank-1 term maximizes the score; score recomputes from corpus") {
    val res = q("t_tfidf").cache()
    assert(res.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
    // Rank 1 dominates within its doc.
    val bad = res.alias("a").join(res.alias("b"), Seq("doc_id"))
      .filter(col("a.rn") === 1 &&
        (col("b.score") > col("a.score") ||
          (col("b.score") === col("a.score") && col("b.term") < col("a.term"))))
      .count()
    assert(bad == 0, "a doc's rank-1 entry must win (score desc, term asc)")
    // Recompute one doc's winning score from the raw corpus.
    val docs = t.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = docs.size
    val top = res.filter(col("rn") === 1).limit(1).collect()(0)
    val (did, term) = (top.getAs[Long]("doc_id"), top.getAs[String]("term"))
    val tf = toks(docs(did)).count(_ == term)
    val df = docs.values.count(d => toks(d).contains(term))
    val score = BigDecimal(tf * (math.log((n + 1.0) / (df + 1.0)) + 1.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getAs[Long]("tf") == tf && top.getAs[Long]("df") == df)
    assert(top.getAs[Double]("score") == score)
  }

  test("tfidf plan: top-3 per doc runs as a window group limit") {
    val p = q("t_tfidf").queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("bm25: every hit contains a query term; per-query ranks are sound") {
    val res = q("t_bm25").cache()
    val qterms = Map(1 -> Set("join", "hash"), 2 -> Set("scan", "filter"),
      3 -> Set("merge", "order"))
    val docs = t.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1)).toSet).toMap
    val rows = res.collect()
    assert(rows.map(_.getAs[Int]("query_id")).toSet == Set(1, 2, 3))
    rows.foreach { r =>
      val hit = docs(r.getAs[Long]("doc_id"))
      assert(qterms(r.getAs[Int]("query_id")).exists(hit.contains),
        "a scored doc must contain at least one query term")
      assert(r.getAs[Double]("score") > 0.0)
    }
    // Ranks are dense 1..5 and ordered by (score desc, doc_id asc).
    qterms.keys.foreach { qid =>
      val qs = rows.filter(_.getAs[Int]("query_id") == qid)
        .sortBy(_.getAs[Int]("rn"))
      assert(qs.map(_.getAs[Int]("rn")).toSeq == (1 to 5))
      qs.sliding(2).foreach { p =>
        val (a, b) = (p(0), p(1))
        assert(a.getAs[Double]("score") > b.getAs[Double]("score") ||
          (a.getAs[Double]("score") == b.getAs[Double]("score") &&
            a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      }
    }
  }

  test("bm25 plan: query-side tables broadcast, corpus never nested-loops") {
    val p = q("t_bm25").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "posting-list access must be a broadcast join on the query terms")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("quality_lr: keep is the rounded-score threshold; sigmoid recomputes") {
    val res = q("t_quality_lr").cache()
    assert(res.filter((col("score") > 0.5).cast("int") =!= col("keep"))
      .count() == 0)
    // Both classes must actually occur (weights were pinned for that).
    val keeps = res.groupBy("keep").count().collect()
      .map(r => r.getAs[Int]("keep") -> r.getAs[Long]("count")).toMap
    assert(keeps.getOrElse(0, 0L) > 0 && keeps.getOrElse(1, 0L) > 0)
    // Recompute one row end-to-end from raw text.
    val row = res.limit(1).collect()(0)
    val text = t.documents.filter(col("doc_id") === row.getAs[Long]("doc_id"))
      .collect()(0).getAs[String]("text")
    val tk = toks(text) // normalize == \S+ here: docs are space-separated
    val nt = text.split("\\s+").count(_.nonEmpty)
    assert(nt == row.getAs[Int]("n_tokens"))
    val ar = text.count(_.isLetter).toDouble / text.length
    val sr = tk.count(Set("the", "and", "of", "to", "a", "in")).toDouble / nt
    val z = 0.08 * (nt - 56) + 8.0 * (sr - 0.06) + 2.0 * (ar - 0.8)
    val score = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("score") == score)
  }

  test("quality_lr plan: pure map-side, zero shuffle") {
    val p = q("t_quality_lr").queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"classifier scoring must not shuffle:\n$p")
  }

  test("colloc: top pair's PMI recomputes from raw corpus counts") {
    val res = q("t_colloc").collect()
    assert(res.nonEmpty && res.length <= 20)
    res.foreach(r => assert(r.getAs[Long]("n") >= 5,
      "min-count prune must hold"))
    // PMI non-increasing down the list (the ranking key is the
    // 8dp-rounded PMI, so the 4dp-rounded output can only tie or
    // decrease).
    val pmis = res.map(_.getAs[Double]("pmi"))
    pmis.zip(pmis.tail).foreach { case (a, b) => assert(a >= b) }
    // Recompute the winner's PMI from the raw corpus.
    val tokss = t.documents.select("text").collect()
      .map(r => toks(r.getString(0)))
    val uni = tokss.flatten.groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val n = uni.values.sum.toDouble
    val bgs = tokss.flatMap(ws => ws.zip(ws.drop(1)))
    val nb = bgs.length.toDouble
    val top = res.head
    val (w1, w2) = (top.getAs[String]("w1"), top.getAs[String]("w2"))
    val c = bgs.count(p => p._1 == w1 && p._2 == w2)
    assert(c.toLong == top.getAs[Long]("n"))
    val pmi = math.log((c / nb) / ((uni(w1) / n) * (uni(w2) / n)))
    assert(math.abs(top.getAs[Double]("pmi") - pmi) < 1e-4 + 1e-9,
      s"PMI drifted: got ${top.getAs[Double]("pmi")}, expect ~$pmi")
  }

  test("zipf: the log-log OLS fit recomputes from raw token counts") {
    val row = q("t_zipf").head()
    val counts = t.documents.select("text").collect()
      .flatMap(r => toks(r.getString(0)))
      .groupBy(identity).map { case (w, g) => (w, g.size) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(1000)
    val xs = counts.indices.map(i => math.log(i + 1.0))
    val ys = counts.map { case (_, c) => math.log(c.toDouble) }
    val nV = counts.size
    val (mx, my) = (xs.sum / nV, ys.sum / nV)
    val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum
    val syy = ys.map(y => (y - my) * (y - my)).sum
    assert(row.getAs[Long]("n_vocab") == nV.toLong)
    assert(row.getAs[Double]("slope") < 0, "Zipf slope must be negative")
    assert(math.abs(row.getAs[Double]("slope") - sxy / sxx) < 1e-3)
    assert(math.abs(row.getAs[Double]("intercept") -
      (my - (sxy / sxx) * mx)) < 1e-3)
    assert(math.abs(row.getAs[Double]("r2") - sxy * sxy / (sxx * syy))
      < 1e-3)
  }

  test("oov_rate: one source's card recomputes from raw text") {
    val res = q("t_oov_rate").collect()
    assert(res.nonEmpty)
    val docs = t.documents.select("source", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val vocab = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, g) => (w, g.size) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(50).map(_._1).toSet
    val src = res.head.getAs[String]("source")
    val mine = docs.filter(_._1 == src)
    val nTok = mine.map(_._2.size).sum
    val nOov = mine.map(_._2.count(!vocab(_))).sum
    val row = res.find(_.getAs[String]("source") == src).get
    assert(row.getAs[Long]("n_docs") == mine.length.toLong)
    assert(row.getAs[Long]("n_tokens") == nTok.toLong)
    assert(row.getAs[Long]("n_oov") == nOov.toLong)
    assert(math.abs(row.getAs[Double]("oov_rate") -
      nOov.toDouble / nTok) < 1e-4 + 1e-9)
  }
}
