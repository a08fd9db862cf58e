package graft.text

import graft.{Q, Tables}
import graft.functions.TextFns
import graft.operators.TopKPerGroup
import org.apache.spark.sql.functions._

/** Corpus ranking / scoring suite for LLM data pipelines: TF-IDF
  * keyword extraction, BM25 retrieval scoring, and model-based
  * quality filtering (the fasttext-classifier analog as a pinned-
  * weight logistic scorer).
  *
  * Shapes (reference for the IR math: Robertson & Zaragoza 2009, the
  * BM25 probabilistic relevance framework; TF-IDF smoothing follows
  * the ln((N+1)/(df+1))+1 convention):
  *  - term stats are map-combined groupBys keyed on (doc,term)/term —
  *    never a per-doc vocabulary array;
  *  - query-side tables (BM25 terms, their dfs) are broadcast, so
  *    scoring touches only docs containing a query term (the
  *    inverted-index access path) and never shuffles the corpus;
  *  - all libm-dependent outputs (LN/EXP) are ROUND(.,4)-pinned and
  *    every rank is computed over the ROUNDED score with a total
  *    tie-break, so engine and oracle order identically.
  */
object RankQueries {

  /** DuckDB twin of [[TextFns.normalize]]. */
  private val normSql =
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Shared tokenization CTEs: per-(doc,term) counts + per-term df. */
  private val toksSql = s"""
      toks AS (
        SELECT doc_id, t AS term
        FROM (SELECT doc_id, unnest(string_split($normSql, ' ')) AS t
              FROM documents)
        WHERE t <> ''),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM tf GROUP BY 1)"""

  /** Per-session memo of the whitespace-token inverted index —
    * (doc_id, term, tf), checkpointed. SIX entries (t_tfidf, t_bm25,
    * s_hybrid_rrf, s_retrieve_rerank, t_zipf, t_oov_rate) each
    * re-ran the normalize+split tokenize pass over the full corpus
    * before their own ranking math — the regex normalization over
    * the text IS the dominant cost, and the (doc,term) counts it
    * produces are a pure derivation of the immutable source dir. At
    * 100 TB this table is the persisted inverted index every serving
    * stack builds anyway; locally one checkpoint serves the family
    * (the t_lm_score/t_ppl_bucket shared-pass discipline, one level
    * down the text stack). */
  private val tfMemo = new graft.tools.SessionMemo[
    String, org.apache.spark.sql.DataFrame]

  private def tfTable(t: Tables): org.apache.spark.sql.DataFrame =
    tfMemo.get(t.spark, t.dir) {
      t.fan(t.documents)
        .select(col("doc_id"),
          explode(split(TextFns.normalize(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
    }

  val all: Seq[Q] = Seq(

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf · (ln((N+1)/(df+1)) + 1) — the dataset-card / topic-tagging
    // primitive. Scale: tf and df are map-combined aggregates; the
    // tf⋈df join is keyed on term (AQE broadcasts df when the vocab
    // is small, co-partitioned shuffle otherwise — never a driver
    // materialization of the vocabulary); top-3 per doc runs on the
    // partial-limit window (InferWindowGroupLimit). Ranks use the
    // rounded score with a term tie-break, so ordering is total.
    Q("t_tfidf", Some(s"""
      WITH $toksSql,
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
      SELECT doc_id, term, tf, df, score, CAST(rn AS INT) AS rn
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term) AS rn
            FROM (SELECT doc_id, term, tf, df,
                    ROUND(tf * (LN(CAST(n + 1 AS DOUBLE) / (df + 1)) + 1.0),
                          4) AS score
                  FROM tf JOIN dfreq USING (term), n))
      WHERE rn <= 3
    """)) { t =>
      val tf = tfTable(t)
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = t.documents.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") *
            (log((col("n") + 1).cast("double") / (col("df") + 1)) + 1.0), 4))
        .select("doc_id", "term", "tf", "df", "score")
      TopKPerGroup.native(scored, Seq(col("doc_id")),
        Seq(col("score").desc, col("term")), 3, "rn")
    },

    // BM25 retrieval: top-5 documents per query for a pinned query
    // set (k1=1.2, b=0.75) — contamination screening and eval-set
    // retrieval both reduce to this. Scale: the query×term table and
    // its df row set are O(|queries|) and BROADCAST, so the only
    // corpus-wide work is the tf build and the doc-length groupBy;
    // scoring touches exactly the posting lists of the query terms
    // (tf ⋈ broadcast(terms)) and the final agg is keyed on
    // (query, doc). avgdl/N ride a 1-row broadcast.
    Q("t_bm25", Some(s"""
      WITH $toksSql,
      dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(dl) AS avgdl
                FROM dl),
      q(query_id, term) AS (VALUES (1, 'join'), (1, 'hash'), (2, 'scan'),
                                   (2, 'filter'), (3, 'merge'), (3, 'order')),
      contrib AS (
        SELECT query_id, doc_id,
               LN(1.0 + (CAST(n - df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5)) *
               (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) /
               (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
                 (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
                   (CAST(dl AS DOUBLE) / avgdl))) AS c
        FROM tf JOIN q USING (term) JOIN dfreq USING (term)
                JOIN dl USING (doc_id), stats)
      SELECT query_id, doc_id, score, CAST(rn AS INT) AS rn
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id) AS rn
            FROM (SELECT query_id, doc_id, ROUND(SUM(c), 4) AS score
                  FROM contrib GROUP BY 1, 2))
      WHERE rn <= 5
    """)) { t =>
      import t.spark.implicits._
      val tf = tfTable(t)
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
      val q = Seq((1, "join"), (1, "hash"), (2, "scan"), (2, "filter"),
        (3, "merge"), (3, "order")).toDF("query_id", "term")
      // query_id × term × df — O(|queries|) rows, broadcast below.
      val qd = q.join(tf.groupBy("term").agg(count(lit(1)).as("df")), "term")
      val idf = log(lit(1.0) + ((col("n") - col("df")).cast("double") + 0.5)
        / (col("df").cast("double") + 0.5))
      val c = idf * (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
      val scores = tf.join(broadcast(qd), "term").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("c", c)
        .groupBy("query_id", "doc_id").agg(round(sum("c"), 4).as("score"))
      TopKPerGroup.native(scores, Seq(col("query_id")),
        Seq(col("score").desc, col("doc_id")), 5, "rn")
    },

    // HYBRID retrieval — reciprocal-rank fusion of the lexical
    // (BM25) and semantic (embedding-cosine) rankers, the standard
    // two-tower serving recipe (RRF: Cormack et al. 2009,
    // score = Σ 1/(60+rank)). Each leg produces its top-20 CANDIDATE
    // list independently — BM25 touches only the query terms'
    // posting lists (broadcast query side, as t_bm25), the vector
    // leg is a broadcast-1-row query against the embedding scan —
    // then the two ≤20-row lists full-outer join and fuse. At 100 TB
    // the fusion joins two k-row lists, not two corpora; ranks are
    // computed AFTER each leg's TopN cut, so the only windows run
    // over ≤20 rows. Both rank orders are total (rounded score +
    // doc_id tie-break) so engine and oracle fuse identically.
    Q("s_hybrid_rrf", Some(s"""
      WITH $toksSql,
      dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(dl) AS avgdl
                FROM dl),
      q(term) AS (VALUES ('join'), ('hash')),
      contrib AS (
        SELECT doc_id,
               LN(1.0 + (CAST(n - df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5)) *
               (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) /
               (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
                 (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
                   (CAST(dl AS DOUBLE) / avgdl))) AS c
        FROM tf JOIN q USING (term) JOIN dfreq USING (term)
                JOIN dl USING (doc_id), stats),
      bm AS (SELECT doc_id, ROUND(SUM(c), 4) AS bscore
             FROM contrib GROUP BY 1),
      bt AS (SELECT * FROM (
               SELECT doc_id, ROW_NUMBER() OVER
                        (ORDER BY bscore DESC, doc_id) AS r_text
               FROM bm) WHERE r_text <= 20),
      qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id = 0),
      vs AS (SELECT d.doc_id,
                    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv)
                      AS cos
             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id, qv),
      vt AS (SELECT * FROM (
               SELECT doc_id, ROW_NUMBER() OVER
                        (ORDER BY ROUND(cos, 8) DESC, doc_id) AS r_vec
               FROM vs) WHERE r_vec <= 20),
      f AS (SELECT COALESCE(bt.doc_id, vt.doc_id) AS doc_id,
                   bt.r_text, vt.r_vec,
                   ROUND(COALESCE(1.0 / (60 + bt.r_text), 0)
                       + COALESCE(1.0 / (60 + vt.r_vec), 0), 6) AS rrf
            FROM bt FULL JOIN vt ON bt.doc_id = vt.doc_id)
      SELECT doc_id, CAST(r_text AS INT) AS r_text,
             CAST(r_vec AS INT) AS r_vec, rrf, CAST(rn AS INT) AS rn
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn
            FROM f)
      WHERE rn <= 10
    """)) { t =>
      import t.spark.implicits._
      import org.apache.spark.sql.expressions.Window
      // ONE tokenize pass, shared family-wide (tfMemo).
      val tf = tfTable(t)
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
      val q = Seq("join", "hash").toDF("term")
      val qd = q.join(tf.groupBy("term").agg(count(lit(1)).as("df")), "term")
      val idf = log(lit(1.0) + ((col("n") - col("df")).cast("double") + 0.5)
        / (col("df").cast("double") + 0.5))
      val c = idf * (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
      val bm = tf.join(broadcast(qd), "term").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("c", c)
        .groupBy("doc_id").agg(round(sum("c"), 4).as("bscore"))
      // TopN cut FIRST (TakeOrderedAndProject), then rank the ≤20
      // survivors — the window never sees more than k rows.
      val bt = bm.orderBy(col("bscore").desc, col("doc_id")).limit(20)
        .withColumn("r_text", row_number().over(
          Window.orderBy(col("bscore").desc, col("doc_id"))))
        .select("doc_id", "r_text")
      val qvRow = t.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv"))
      val vs = t.documents.select("doc_id")
        .join(t.embeddings.select(col("vec_id").as("doc_id"),
          col("embedding").cast("array<double>").as("v")), "doc_id")
        .crossJoin(broadcast(qvRow))
        .select(col("doc_id"),
          (graft.functions.VectorFns.dot(col("v"), col("qv")) /
            (sqrt(graft.functions.VectorFns.dot(col("v"), col("v"))) *
             sqrt(graft.functions.VectorFns.dot(col("qv"), col("qv")))))
            .as("cos"))
      val vt = vs.orderBy(round(col("cos"), 8).desc, col("doc_id")).limit(20)
        .withColumn("r_vec", row_number().over(
          Window.orderBy(round(col("cos"), 8).desc, col("doc_id"))))
        .select("doc_id", "r_vec")
      val fused = bt.join(vt, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("r_text"), col("r_vec"),
          round(coalesce(lit(1.0) / (lit(60) + col("r_text")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)), 6)
            .as("rrf"))
      fused.orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("rrf").desc, col("doc_id"))))
    },

    // RETRIEVE-THEN-RERANK — the cascade companion to s_hybrid_rrf's
    // fusion: a cheap lexical retriever (BM25, query-term posting
    // lists only) nominates top-20 candidates, then an exact
    // embedding-cosine reranker scores ONLY those candidates and
    // keeps top-5 — the standard two-stage RAG/serving recipe where
    // the expensive scorer never sees the corpus. Scale shape: stage
    // 1 touches the query terms' posting lists (broadcast query
    // side); stage 2 is a BROADCAST of the ≤20-row candidate list
    // keyed into the embeddings join — the index-lookup pattern, so
    // only candidate vectors are read — and every window runs over
    // ≤20 rows after a TakeOrdered cut. Both stages' rank keys are
    // total orders (rounded score + doc_id), so the cascade is
    // deterministic end to end and hash-oracled.
    Q("s_retrieve_rerank", Some(s"""
      WITH $toksSql,
      dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(dl) AS avgdl
                FROM dl),
      q(term) AS (VALUES ('join'), ('hash')),
      contrib AS (
        SELECT doc_id,
               LN(1.0 + (CAST(n - df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5)) *
               (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) /
               (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
                 (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
                   (CAST(dl AS DOUBLE) / avgdl))) AS c
        FROM tf JOIN q USING (term) JOIN dfreq USING (term)
                JOIN dl USING (doc_id), stats),
      bm AS (SELECT doc_id, ROUND(SUM(c), 4) AS bscore
             FROM contrib GROUP BY 1),
      bt AS (SELECT * FROM (
               SELECT doc_id, bscore, ROW_NUMBER() OVER
                        (ORDER BY bscore DESC, doc_id) AS r_text
               FROM bm) WHERE r_text <= 20),
      qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id = 0),
      cand AS (
        SELECT bt.doc_id AS doc_id, bt.r_text AS r_text,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv)
                 AS c
        FROM bt JOIN embeddings e ON e.vec_id = bt.doc_id, qv)
      SELECT doc_id, CAST(r_text AS INT) AS r_text,
             ROUND(c, 4) AS cos, CAST(rn AS INT) AS rn
      FROM (SELECT *, ROW_NUMBER() OVER
                       (ORDER BY ROUND(c, 8) DESC, doc_id) AS rn
            FROM cand)
      WHERE rn <= 5
    """)) { t =>
      import t.spark.implicits._
      import org.apache.spark.sql.expressions.Window
      // ONE tokenize pass, shared family-wide (tfMemo).
      val tf = tfTable(t)
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
      val q = Seq("join", "hash").toDF("term")
      val qd = q.join(tf.groupBy("term").agg(count(lit(1)).as("df")), "term")
      val idf = log(lit(1.0) + ((col("n") - col("df")).cast("double") + 0.5)
        / (col("df").cast("double") + 0.5))
      val c = idf * (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
      val bm = tf.join(broadcast(qd), "term").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("c", c)
        .groupBy("doc_id").agg(round(sum("c"), 4).as("bscore"))
      val bt = bm.orderBy(col("bscore").desc, col("doc_id")).limit(20)
        .withColumn("r_text", row_number().over(
          Window.orderBy(col("bscore").desc, col("doc_id"))))
        .select("doc_id", "r_text")
      val qvRow = t.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv"))
      // Stage 2 reads ONLY candidate vectors: the ≤20-row list is the
      // broadcast build side keyed into the embeddings scan.
      val cand = broadcast(bt)
        .join(t.embeddings.select(col("vec_id").as("doc_id"),
          col("embedding").cast("array<double>").as("v")), "doc_id")
        .crossJoin(broadcast(qvRow))
        .select(col("doc_id"), col("r_text"),
          (graft.functions.VectorFns.dot(col("v"), col("qv")) /
            (sqrt(graft.functions.VectorFns.dot(col("v"), col("v"))) *
             sqrt(graft.functions.VectorFns.dot(col("qv"), col("qv")))))
            .as("c"))
      cand.orderBy(round(col("c"), 8).desc, col("doc_id")).limit(5)
        .withColumn("rn", row_number().over(
          Window.orderBy(round(col("c"), 8).desc, col("doc_id"))))
        .select(col("doc_id"), col("r_text"),
          round(col("c"), 4).as("cos"), col("rn"))
    },

    // Model-based quality filtering: a logistic scorer with pinned
    // weights over the t_quality feature family (token count, alpha
    // ratio, stopword ratio) — the shape of every learned quality
    // classifier (fasttext / KenLM-gated) once training is done:
    // inference is a broadcast weight vector and a map-side dot +
    // sigmoid. Pure scan→project, zero shuffle at any corpus size;
    // keep decisions compare the ROUNDED score so engine and oracle
    // agree bit-for-bit.
    Q("t_quality_lr", Some("""
      SELECT doc_id, n_tokens, score, CAST(score > 0.5 AS INT) AS keep
      FROM (SELECT doc_id, n_tokens,
              ROUND(1.0 / (1.0 + EXP(-(
                CAST(0.08 AS DOUBLE) * (n_tokens - 56)
                + CAST(8.0 AS DOUBLE) * (sr - CAST(0.06 AS DOUBLE))
                + CAST(2.0 AS DOUBLE) * (ar - CAST(0.8 AS DOUBLE))))), 4)
                AS score
            FROM (SELECT doc_id,
                    CAST(LEN(regexp_extract_all(text, '(\S+)', 1)) AS INT)
                      AS n_tokens,
                    CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g'))
                         AS DOUBLE) / LENGTH(text) AS ar,
                    CAST(LEN(regexp_extract_all(text,
                           '(?i)\b(the|and|of|to|a|in)\b')) AS DOUBLE)
                      / LEN(regexp_extract_all(text, '(\S+)', 1)) AS sr
                  FROM documents
                  WHERE LEN(regexp_extract_all(text, '(\S+)', 1)) > 0) f)
    """)) { t =>
      val feats = t.documents
        .select(col("doc_id"), expr("text_stats(text)").as("s"),
          size(regexp_extract_all(col("text"),
            lit("(?i)\\b(the|and|of|to|a|in)\\b"), lit(0))).as("n_stop"))
        .filter(col("s.n_tokens") > 0)
        .select(col("doc_id"), col("s.n_tokens").as("n_tokens"),
          (col("s.n_alpha").cast("double") / col("s.n_chars")).as("ar"),
          (col("n_stop").cast("double") / col("s.n_tokens")).as("sr"))
      val z = lit(0.08) * (col("n_tokens") - 56) +
        lit(8.0) * (col("sr") - lit(0.06)) +
        lit(2.0) * (col("ar") - lit(0.8))
      feats
        .select(col("doc_id"), col("n_tokens"),
          round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("score"))
        .withColumn("keep", (col("score") > 0.5).cast("int"))
    },

    // PMI collocation mining — the phrase-detection pass a tokenizer
    // or word2vec-style pipeline runs before segmentation (score
    // word pairs by pointwise mutual information; high-PMI pairs
    // become phrase units). Scale: unigram and bigram counts are
    // map-combined groupBys keyed on the term/pair — the text never
    // crosses an exchange; the unigram marginal table is vocab-sized
    // and broadcast onto the (min-count pruned) bigram table twice;
    // the corpus totals are 1-row crossJoin broadcasts; the top-20
    // cut is a TakeOrdered. PMI = ln((c/NB) / ((c1/N)·(c2/N))) on
    // exact BIGINT counts, so only the final ln needs the 4dp pin;
    // ranks use the 8dp-rounded score with a (w1, w2) tie-break.
    Q("t_colloc", Some(s"""
      WITH w AS (
        SELECT doc_id, string_split($normSql, ' ') AS ws
        FROM documents),
      u AS (SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS uc
            FROM (SELECT unnest(ws) AS t FROM w) z
            WHERE t <> '' GROUP BY 1),
      n AS (SELECT CAST(SUM(uc) AS BIGINT) AS n FROM u),
      bg AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
             FROM w, UNNEST(generate_series(1, LEN(ws) - 1)) AS g(i)),
      nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bg),
      bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
             FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      p AS (
        SELECT bc.w1, bc.w2, bc.c,
               LN((CAST(bc.c AS DOUBLE) / nb.nb) /
                  ((CAST(u1.uc AS DOUBLE) / n.n) *
                   (CAST(u2.uc AS DOUBLE) / n.n))) AS pmi
        FROM bc, n, nb
        JOIN u u1 ON u1.term = bc.w1
        JOIN u u2 ON u2.term = bc.w2)
      SELECT w1, w2, c AS n, ROUND(pmi, 4) AS pmi
      FROM p ORDER BY ROUND(pmi, 8) DESC, w1, w2 LIMIT 20
    """)) { t =>
      // The tokenized corpus is consumed by BOTH bigram aggregates
      // (total count + pair counts) — checkpoint it so the
      // normalize+split kernel runs once; unigram counts fold from
      // the session-shared (doc_id, term, tf) index (identical
      // tokenization — tfTable), which the tfidf family already
      // materialized, instead of a second tokenize pass.
      val docs = t.fan(t.documents)
        .select(split(TextFns.normalize(col("text")), " ").as("ws"))
        .localCheckpoint()
      val uni = tfTable(t).groupBy("term").agg(sum("tf").as("uc"))
      val n = uni.agg(sum("uc").as("n"))
      val bg = docs.select(explode(expr(
          "CASE WHEN size(ws) >= 2 THEN transform(" +
            "sequence(1, size(ws) - 1), " +
            "i -> struct(ws[i - 1] AS w1, ws[i] AS w2)) " +
            "ELSE array() END")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val nb = bg.agg(count(lit(1)).as("nb"))
      val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 5)
      val pmi = log((col("c").cast("double") / col("nb")) /
        ((col("uc1").cast("double") / col("n")) *
         (col("uc2").cast("double") / col("n"))))
      bc.join(broadcast(uni.select(col("term").as("w1"),
          col("uc").as("uc1"))), "w1")
        .join(broadcast(uni.select(col("term").as("w2"),
          col("uc").as("uc2"))), "w2")
        .crossJoin(broadcast(n)).crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c").as("n"),
          round(pmi, 4).as("pmi"), round(pmi, 8).as("_k"))
        .orderBy(col("_k").desc, col("w1"), col("w2"))
        .limit(20)
        .drop("_k")
    },

    // Zipf-law fit — the corpus-health diagnostic (token frequency
    // vs rank should be log-log linear with slope ≈ −1; a truncated
    // or templated corpus bends the curve). One map-combined token
    // count, then the fit runs entirely on the VOCAB table: rank is
    // a window over (count desc, term) — vocab-sized by
    // construction, orders of magnitude under the corpus, same class
    // as the registry's other tiny-table global windows — and the
    // OLS fit of ln(count) on ln(rank) is one regr_slope/intercept/
    // r2 aggregate, capped at the top 1000 ranks so the contract is
    // fixed-size at any corpus scale. 1-row output, 4dp-pinned.
    Q("t_zipf", Some(s"""
      WITH u AS (SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS uc
                 FROM (SELECT unnest(string_split($normSql, ' ')) AS t
                       FROM documents) z
                 WHERE t <> '' GROUP BY 1),
      r AS (SELECT uc,
                   ROW_NUMBER() OVER (ORDER BY uc DESC, term) AS rank
            FROM u)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
             ROUND(regr_slope(LN(CAST(uc AS DOUBLE)),
                              LN(CAST(rank AS DOUBLE))), 4) AS slope,
             ROUND(regr_intercept(LN(CAST(uc AS DOUBLE)),
                                  LN(CAST(rank AS DOUBLE))), 4)
               AS intercept,
             ROUND(regr_r2(LN(CAST(uc AS DOUBLE)),
                           LN(CAST(rank AS DOUBLE))), 4) AS r2
      FROM r WHERE rank <= 1000
    """)) { t =>
      import org.apache.spark.sql.expressions.Window
      // Corpus term frequency = Σ tf over the shared inverted index
      // (identical values, no second tokenize pass).
      val uni = tfTable(t).groupBy("term").agg(sum("tf").as("uc"))
      // Vocab-sized global window (counts are already aggregated).
      val ranked = uni.withColumn("rank",
          row_number().over(Window.orderBy(col("uc").desc, col("term"))))
        .filter(col("rank") <= 1000)
        .select(log(col("uc").cast("double")).as("y"),
          log(col("rank").cast("double")).as("x"))
      ranked.agg(count(lit(1)).as("n_vocab"),
        round(regr_slope(col("y"), col("x")), 4).as("slope"),
        round(regr_intercept(col("y"), col("x")), 4).as("intercept"),
        round(regr_r2(col("y"), col("x")), 4).as("r2"))
    },

    // Vocabulary-coverage / OOV-rate card — the tokenizer-QA pass
    // (how much of each source's token stream a fixed top-k
    // vocabulary covers; a high OOV share flags domain drift the
    // tokenizer was not trained for). The vocabulary is the corpus
    // top-50 by frequency with a deterministic (count desc, term)
    // cut. Scale: one map-combined term count builds the vocab (the
    // TakeOrdered cut is vocab-sized), the 50-row vocab broadcasts
    // onto the token stream map-side, and the per-source rollup is a
    // map-combined aggregation whose shuffle carries |sources| rows —
    // the text itself never crosses an exchange.
    Q("t_oov_rate", Some(s"""
      WITH toks AS (
        SELECT doc_id, source, t AS term
        FROM (SELECT doc_id, source,
                     unnest(string_split($normSql, ' ')) AS t
              FROM documents) z
        WHERE t <> ''),
      v AS (SELECT term FROM (
              SELECT term, COUNT(*) AS c FROM toks
              GROUP BY 1 ORDER BY c DESC, term LIMIT 50)),
      m AS (SELECT source, doc_id,
                   CASE WHEN term IN (SELECT term FROM v)
                        THEN 0 ELSE 1 END AS oov
            FROM toks)
      SELECT source,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(oov) AS BIGINT) AS n_oov,
             ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 4) AS oov_rate
      FROM m GROUP BY source
    """)) { t =>
      // The shared inverted index carries token MULTIPLICITY as tf,
      // so every token-stream aggregate here is a tf-weighted sum
      // over (doc, term) rows — identical values, one tokenize pass
      // family-wide; the source label joins back from the 2-column
      // documents projection (pruned scan, no text re-read).
      val tfs = tfTable(t)
        .join(t.documents.select("doc_id", "source"), "doc_id")
      val vocab = tfs.groupBy("term").agg(sum("tf").as("c"))
        .orderBy(col("c").desc, col("term")).limit(50)
        .select(col("term"), lit(1).as("inv"))
      tfs.join(broadcast(vocab), Seq("term"), "left")
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          sum(col("tf")).as("n_tokens"),
          sum(when(col("inv").isNull, col("tf")).otherwise(0L))
            .as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov").cast("double") / col("n_tokens"), 4))
    },
  )
}
