package graft.ann

import graft.{Q, Tables}
import graft.functions.VectorFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float).
  *
  * Scale design: the brute-force baseline broadcasts the (small)
  * query set against a single corpus scan — no shuffle, one pass,
  * per-partition top-k before the final window. The LSH variant is
  * the 100 TB path: 8-bit random-hyperplane signatures × 4 tables
  * bucket the corpus so each query probes ~corpus/256 per table.
  */
object AnnQueries {

  /** Corpus vectors with their norm precomputed ONCE per vector —
    * every downstream scorer uses cosinePre (1 dot per pair). */
  private def vecs(t: Tables): DataFrame =
    t.fan(t.embeddings)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))

  /** Per-session memo of the bounded-pool exact-kNN support pair —
    * the (vec_id < 200) pool and its exact top-3 neighbor list, both
    * checkpointed: s_knn_graph (build + mutual marking) and
    * s_knn_beam (link build for the search walk) each re-ran the
    * same pool crossJoin + re-rank before their own kernel; both are
    * pure derivations of the immutable source dir (the
    * Graph.derived / tfMemo discipline). */
  private val knnMemo = new graft.tools.SessionMemo[
    String, (DataFrame, DataFrame)]

  /** (pool, knn): pool = normed vectors under the 200-id bound;
    * knn = exact top-3 (qid, vec_id, cos) with the (round-8, vec_id)
    * tie-break. */
  private def knnPool(t: Tables): (DataFrame, DataFrame) =
    knnMemo.get(t.spark, t.dir) {
      val pool = vecs(t).filter(col("vec_id") < 200).localCheckpoint()
      val qs = pool.select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nv").as("nq"))
      val knn = rerankTopK(pool.crossJoin(broadcast(qs)), topk = 3,
        dedup = false).localCheckpoint()
      (pool, knn)
    }

  /** (label, pos, val) exploded dims — the shared input of the
    * centroid analytics. */
  private def dimExploded(t: Tables): DataFrame =
    t.embeddings
      .select(col("label"), col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "val")))

  /** Per-`keys` mean vector WITHOUT collecting vectors: map-combined
    * (keys, dim) partial sums, then a ≤64-element array rebuild per
    * key. */
  private def centroid(x: DataFrame, keys: Seq[String]): DataFrame = {
    val dims = x.groupBy((keys :+ "pos").map(col): _*)
      .agg(sum("val").as("s"), count(lit(1)).as("n"))
    dims.groupBy(keys.map(col): _*)
      .agg(expr(
        "transform(array_sort(collect_list(struct(pos, s / n as a))), p -> p.a)")
        .as("cv"), max("n").as("n"))
  }

  /** 4 LSH tables × 8-bit signatures from deterministic pseudo-random
    * hyperplanes: component (table p, plane q, dim j) = xxhash64(p,q,j)
    * scaled to [-1, 1]. Computed as posexplode → 32 codegen'd dot-
    * product aggregates (one per plane) then sign-packed — nested HOF
    * lambdas re-evaluate per iteration and measured 9 s at sf0.1;
    * this shape is a single shuffle on vec_id with map-side partials. */
  private def withSigs(vecs: DataFrame): DataFrame = {
    val comps = vecs.select(col("vec_id"),
      posexplode(col("v")).as(Seq("j", "x")))
    val dots = for (p <- 0 until 4; q <- 0 until 8) yield
      sum(col("x") *
        (xxhash64(lit(p), lit(q), col("j")) % 1001).cast("double") / 1000.0)
        .as(s"d_${p}_$q")
    val sigs = (0 until 4).map { p =>
      (0 until 8).map(q =>
        when(col(s"d_${p}_$q") >= 0, lit(1L << q)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"sig_$p")
    }
    val packed = comps.groupBy("vec_id").agg(dots.head, dots.tail: _*)
      .select(col("vec_id") +: sigs: _*)
      .select(col("vec_id"),
        array((0 until 4).map(p => col(s"sig_$p")): _*).as("sigs"))
    vecs.join(packed, "vec_id")
  }

  /** The s_embed_qa kernel over any (label, embedding) frame —
    * public so the spec can drive constructed pathologies (wrong
    * dim, NaN, zero and NULL vectors) through the exact entry code.
    * NULL-vector semantics are EXPLICIT on both engines (a NULL
    * embedding is a bad-dim row, not a silently-skipped one — the
    * dirty input this card exists to surface); its norm stays NULL,
    * which AVG/MIN/MAX skip identically on both engines. exists()
    * short-circuits the NaN probe with no intermediate array. */
  def embedQa(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), toDouble(col("embedding")).as("v"))
      .select(col("label"),
        coalesce((size(col("v")) =!= 64).cast("int"), lit(1))
          .as("bad_dim"),
        coalesce(exists(col("v"), x => isnan(x)).cast("int"), lit(0))
          .as("has_nan"),
        norm(col("v")).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("bad_dim").cast("long").as("n_bad_dim"),
        sum("has_nan").cast("long").as("n_nan"),
        sum(when(col("nrm") === 0, 1).otherwise(0)).cast("long")
          .as("n_zero"),
        round(avg("nrm"), 4).as("norm_avg"),
        round(min("nrm"), 4).as("norm_min"),
        round(max("nrm"), 4).as("norm_max"))

  val all: Seq[Q] = Seq(

    // Brute-force cosine top-5 for query set vec_id < 10. Ranking key
    // is round(cos, 8) + vec_id: deterministic under the ~1e-13
    // float-noise floor of both engines.
    Q("s_ann_brute", Some("""
      WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 10),
      pairs AS (
        SELECT qid, vec_id,
               list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])) AS c
        FROM q, embeddings WHERE vec_id <> qid)
      SELECT qid, vec_id, ROUND(c, 4) AS cos FROM (
        SELECT qid, vec_id, c,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ROUND(c, 8) DESC, vec_id) AS rn
        FROM pairs) t
      WHERE rn <= 5
    """)) { t =>
      val corpus = vecs(t)
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nv").as("nq"))
      // Unique pairs by construction — no dedup shuffle needed.
      rerankTopK(corpus.crossJoin(broadcast(queries)), topk = 5,
        dedup = false)
    },

    // IVF (inverted-file) ANN — the coarse-quantizer scale path:
    // deterministic k-means (first-C seeds, 2 Lloyd rounds, centroids
    // rounded to 6dp to kill float-order noise), corpus assigned to
    // its nearest cell, queries probe their 4 nearest cells, exact
    // cosine re-rank inside the probed cells only. At 100 TB the
    // corpus-cell assignment is one broadcast-centroid map pass and
    // the probe touches ~nprobe/C of the corpus per query. k-means
    // arithmetic is engine-specific → rows-only; the spec checks
    // recall against brute force.
    Q("s_ann_ivf", None) { t =>
      val corpus = vecs(t)
      val (cells, centroids) = IvfIndex.build(corpus, c = 16, iters = 2)
      val queryProbes = IvfIndex.probes(
        corpus.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nv").as("nq")),
        centroids, nprobe = 4)
      rerankTopK(queryProbes.join(cells, "cell"), topk = 3, dedup = true)
    },

    // IVF probe against the PERSISTED index — the steady-state
    // operation a serving cluster runs: index construction is
    // amortized (writeIndex once; here lazily on first touch, keyed
    // by the data dir), each query reads only its nprobe cell
    // directories via dynamic partition pruning. Same parameters as
    // s_ann_ivf, so the two entries split the cost story: s_ann_ivf
    // = build+probe, this = probe only.
    Q("s_ann_ivf_probe", None) { t =>
      // Cache key carries the build parameters AND a content
      // fingerprint of the source data (file names/sizes/mtimes) —
      // regenerated data at the same path, or two data dirs whose
      // String.hashCode collides, get distinct index dirs instead of
      // silently serving a stale index. A code change to
      // IvfIndex.build itself still requires wiping /tmp/graft_ivf_*
      // (acceptable for a dev cache — IvfIndexSpec cross-checks
      // probe == fresh build).
      val (c, iters) = (16, 2)
      val dir = IvfIndex.sharedCacheDir(t.dir, c, iters)
      if (!new java.io.File(s"$dir/centroids/_SUCCESS").exists())
        IvfIndex.writeIndex(vecs(t), dir, c = c, iters = iters)
      IvfIndex.probeIndex(t.spark, dir,
        t.embeddings.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv")),
        nprobe = 4, topk = 3)
    },

    // Product-quantization ANN — the vector-compression scale path
    // (PqIndex: 8 subspaces × 16 centroids = 64× smaller corpus
    // representation). Queries build one 8×16 ADC lookup table each;
    // every corpus vector's approximate dot product is then 8 table
    // lookups over its codes — the float corpus is never scanned at
    // query time. ADC top-10 candidates re-rank by exact cosine into
    // the shared top-3 output shape. Quantizer arithmetic is
    // engine-specific → rows-only; the spec checks recall against
    // brute force.
    Q("s_ann_pq", None) { t =>
      val corpus = vecs(t)
      val (codes, cent) = PqIndex.build(
        corpus.select("vec_id", "v"), m = 8, s = 8, k = 16, iters = 2)
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nv").as("nq"))
      val adcTop = PqIndex.adcCandidates(codes, cent, queries,
        s = 8, topn = 10)
      rerankTopK(
        adcTop.join(corpus, "vec_id").join(queries, "qid"),
        topk = 3, dedup = false)
    },

    // PQ probe against the PERSISTED index — the steady-state serving
    // op: codebook training is amortized (lazily written once, keyed
    // by a content fingerprint of the source like the IVF index);
    // each query reads the 64×-compressed code table + the tiny
    // codebooks, never the float corpus, and only the ADC top-10
    // candidates' true vectors are fetched for the exact re-rank —
    // at 100 TB that's the difference between scanning compressed
    // codes and scanning embeddings. Same parameters as s_ann_pq, so
    // the two entries split build+probe vs probe-only exactly like
    // s_ann_ivf / s_ann_ivf_probe.
    Q("s_ann_pq_probe", None) { t =>
      val (m, s, k, iters) = (8, 8, 16, 2)
      val F = graft.sources.Formats
      val dir = F.cacheDir(
        s"/tmp/graft_pq_m${m}s${s}k${k}i${iters}_${F.sanitize(t.dir)}",
        F.contentFingerprint(s"${t.dir}/embeddings.parquet"))
      if (!new java.io.File(s"$dir/codebooks/_SUCCESS").exists())
        PqIndex.writeIndex(vecs(t).select("vec_id", "v"), dir, m, s, k, iters)
      val sess = t.spark
      val codes = sess.read.parquet(s"$dir/codes")
      val cent = sess.read.parquet(s"$dir/codebooks")
      val corpus = vecs(t)
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nv").as("nq"))
      val adcTop = PqIndex.adcCandidates(codes, cent, queries,
        s = s, topn = 10)
      rerankTopK(
        adcTop.join(corpus, "vec_id").join(queries, "qid"),
        topk = 3, dedup = false)
    },

    // IVF+PQ — the COMPOSED billion-scale serving shape (the classic
    // IVFPQ layout: coarse cells × residual codebooks). The IVF
    // quantizer partitions the corpus into cells; PQ codebooks are
    // trained on the RESIDUALS v − c(v) — residuals concentrate near
    // zero, so the same 16 centroids per subspace quantize far finer
    // than raw vectors. Query-time inner product decomposes exactly:
    // dot(q, v) = dot(q, c(v)) + dot(q, v−c(v)) — the first term is
    // one number per (query, probed cell) (the probe already paid
    // it), the second is ADC'd as 8 code lookups in the query's 8×16
    // LUT over the RESIDUAL codebooks built from the FULL query
    // sub-vectors. ADC top-10 candidates re-rank by exact cosine
    // into the shared top-3 shape. At 100 TB the query-time scan is
    // nprobe/C of the CODE table (cell-partitioned, 64× smaller than
    // the floats); the float corpus is touched only for the
    // ≤10·|queries| re-rank rows. Both quantizers keep the
    // deterministic conventions (first-k seeds, 6dp rounding), but
    // the arithmetic is engine-specific → rows-only; DedupAnnSpec
    // pins recall vs brute force and the candidate contract.
    Q("s_ann_ivfpq", None) { t =>
      val corpus = vecs(t)
      // The shared composition (IvfPqIndex): IVF cells + PQ on
      // residuals; the probe constant carries the exact dot(q, c)
      // term and doubles as the cell restriction (the
      // partition-pruning analog: non-probed cells never join); the
      // shared ADC candidate generator's LUT over the RESIDUAL
      // codebooks supplies the dot(q, v−c) term.
      //
      // The COARSE quantizer is not retrained here: it is the exact
      // same (c=16, iters=2) training s_ann_ivf_probe persists, so
      // this entry loads it from that shared content-fingerprint
      // cache (writing it lazily on first touch) and spends its
      // in-query training budget only on the COMPOSED leg — the
      // residual PQ codebooks. Amortizing the coarse k-means is also
      // the production shape: one coarse quantizer serves every
      // downstream index variant built over it.
      val (cells, centroids) = IvfPqIndex.coarseFromSharedCache(t, corpus)
      val (codes, cent) = IvfPqIndex.residualPq(
        cells, centroids, m = 8, s = 8, k = 16, iters = 2)
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nv").as("nq"))
      val adcTop = PqIndex.adcCandidates(
        codes.join(cells.select("vec_id", "cell"), "vec_id"),
        cent, queries, s = 8, topn = 10,
        cellConst = Some(IvfPqIndex.probeConst(queries, centroids,
          nprobe = 4)))
      rerankTopK(adcTop.join(corpus, "vec_id").join(queries, "qid"),
        topk = 3, dedup = false)
    },

    // IVFPQ probe against the PERSISTED index — the steady-state
    // serving op for the composed layout: training is amortized
    // (lazily written once, keyed by a content fingerprint of the
    // source like the IVF/PQ indexes); the on-disk codes are
    // partitioned BY CELL, so each query reads its nprobe cell
    // directories via dynamic partition pruning (spec-asserted) and
    // each code row is 8 small ints — at 100 TB the probe reads
    // nprobe/C of a 64×-compressed table, and the float corpus is
    // touched only for the ADC top-10 re-rank rows. Same parameters
    // as s_ann_ivfpq, so the two entries split build+probe vs
    // probe-only exactly like the IVF and PQ pairs; the spec pins
    // probe == in-query build.
    Q("s_ann_ivfpq_probe", None) { t =>
      val (c, iters, m, s, k) = (16, 2, 8, 8, 16)
      val F = graft.sources.Formats
      val dir = F.cacheDir(
        s"/tmp/graft_ivfpq_c${c}i${iters}m${m}s${s}k${k}_" +
          F.sanitize(t.dir),
        F.contentFingerprint(s"${t.dir}/embeddings.parquet"))
      if (!new java.io.File(s"$dir/centroids/_SUCCESS").exists())
        IvfPqIndex.writeIndex(vecs(t).select("vec_id", "v"), dir,
          c, iters, m, s, k)
      IvfPqIndex.probeIndex(t.spark, dir,
        t.embeddings.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"),
            toDouble(col("embedding")).as("qv")),
        vecs(t), s = s, nprobe = 4, topn = 10, topk = 3)
    },

    // SCALAR-quantization (SQ8) ANN — the third compression leg next
    // to IVF (partitioning) and PQ (codebooks): each vector stores
    // its (min, max) plus one uint8 code per dimension — 4× smaller
    // than float32 — and probes score against the MIDPOINT
    // reconstruction mn + (code+0.5)·(mx−mn)/256. Quantization is
    // pure per-row arithmetic (no training), so unlike IVF/PQ the
    // whole pipeline is engine-reproducible and HASH-ORACLED: DuckDB
    // runs the identical clamp/floor/reconstruct/dot chain in the
    // same association order. Map-side until the final top-k window;
    // at 100 TB only the code table is scanned at query time.
    Q("s_ann_sq8", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      s AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM v),
      r AS (SELECT vec_id,
              list_transform(v, x -> mn + (LEAST(255, CAST(FLOOR(
                (x - mn) * 256.0 / (mx - mn)) AS INT)) + 0.5)
                * (mx - mn) / 256.0) AS rv
            FROM s WHERE mx > mn),
      q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < 10),
      pairs AS (
        SELECT qid, vec_id, list_inner_product(qv, rv) AS d
        FROM q, r WHERE vec_id <> qid)
      SELECT qid, vec_id, ROUND(d, 4) AS adc FROM (
        SELECT qid, vec_id, d,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ROUND(d, 8) DESC, vec_id) AS rn
        FROM pairs) z
      WHERE rn <= 5
    """)) { t =>
      import org.apache.spark.sql.expressions.Window
      val stats = t.fan(t.embeddings)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("mn", array_min(col("v")))
        .withColumn("mx", array_max(col("v")))
        .filter(col("mx") > col("mn"))
      // codes is the persisted form (uint8 per dim); reconstruction
      // happens code-side so the float corpus never rejoins the scan.
      val codes = stats.withColumn("codes",
        transform(col("v"), x => least(lit(255),
          floor((x - col("mn")) * 256.0 / (col("mx") - col("mn")))
            .cast("int"))))
      val recon = codes.select(col("vec_id"),
        transform(col("codes"), cd =>
          col("mn") + (cd.cast("double") + 0.5) *
            (col("mx") - col("mn")) / 256.0).as("rv"))
      val queries = t.embeddings.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
      val w = Window.partitionBy("qid")
        .orderBy(round(col("d"), 8).desc, col("vec_id"))
      recon.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), dot(col("qv"), col("rv")).as("d"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("vec_id"), round(col("d"), 4).as("adc"))
    },

    // LSH-bucketed ANN: 4 tables × 8 hyperplane bits; candidates are
    // same-bucket vectors, re-ranked by exact cosine, top-3 kept.
    // Hash-derived planes are engine-specific → rows-only; the spec
    // checks recall against brute force.
    Q("s_ann_lsh", None) { t =>
      val corpus = withSigs(vecs(t))
        .select(col("vec_id"), col("v"), col("nv"),
          posexplode(col("sigs")).as(Seq("tbl", "sig")))
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nv").as("nq"), col("tbl"), col("sig"))
      rerankTopK(queries.join(corpus, Seq("tbl", "sig")), topk = 3,
        dedup = true)
    },

    // Per-domain embedding centroids + drift — the dataset-card
    // analytics a training-mix pipeline runs per source/domain: each
    // label's mean vector, its norm, and its cosine against the
    // global centroid (domain drift / outlier-domain detection). The
    // centroid is computed WITHOUT collecting vectors: posexplode →
    // (label, dim) partial sums with map-side combine — the shuffle
    // carries |labels|·64 scalar cells regardless of corpus size —
    // then ≤64-element arrays rebuild per label and the 1-row global
    // centroid broadcasts. Dimension-wise sums round to 4dp so both
    // engines' float summation order cannot surface.
    // Embedding-corpus QA card — the audit a pipeline runs BEFORE
    // spending an indexing pass over 100 TB of vectors: per label,
    // wrong-dimension / NaN / zero-vector counts (any of which
    // corrupts a cosine index silently — a zero vector makes cosine
    // undefined, a NaN poisons every distance it touches) plus the
    // norm distribution (mean/min/max — a wild norm spread flags
    // unnormalized mixtures before MIPS/cosine confusion strikes).
    // One map-side pass (dot/isnan/size are per-row codegen'd HOFs)
    // into a |labels|-row aggregate; norms are transcendental-free
    // but AVG is summation-ordered, so 4dp rounding on both engines.
    Q("s_embed_qa", Some("""
      WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      s AS (SELECT label,
                   COALESCE(CAST(len(v) <> 64 AS INT), 1) AS bad_dim,
                   COALESCE(CAST(len(list_filter(v, x -> isnan(x))) > 0
                     AS INT), 0) AS has_nan,
                   sqrt(list_dot_product(v, v)) AS nrm
            FROM e)
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(bad_dim) AS BIGINT) AS n_bad_dim,
             CAST(SUM(has_nan) AS BIGINT) AS n_nan,
             CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
             ROUND(AVG(nrm), 4) AS norm_avg,
             ROUND(MIN(nrm), 4) AS norm_min,
             ROUND(MAX(nrm), 4) AS norm_max
      FROM s GROUP BY label
    """)) { t =>
      embedQa(t.embeddings)
    },

    Q("s_embed_centroid", Some("""
      WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      x AS (SELECT label, UNNEST(v) AS val, UNNEST(range(64)) AS pos
            FROM e),
      cd AS (SELECT label, pos, AVG(val) AS a
             FROM x GROUP BY label, pos),
      cents AS (SELECT label, list(a ORDER BY pos) AS cv,
                       (SELECT COUNT(*) FROM e e2
                        WHERE e2.label = cd.label) AS n
                FROM cd GROUP BY label),
      g AS (SELECT list(a ORDER BY pos) AS gv FROM
              (SELECT pos, AVG(val) AS a FROM x GROUP BY pos))
      SELECT label, CAST(n AS BIGINT) AS n,
             ROUND(sqrt(list_dot_product(cv, cv)), 4) AS centroid_norm,
             ROUND(list_cosine_similarity(cv, gv), 4) AS cos_global
      FROM cents, g
    """)) { t =>
      val x = dimExploded(t)
      val cents = centroid(x, Seq("label"))
      val g = centroid(x.withColumn("g", lit(1)), Seq("g"))
        .select(col("cv").as("gv"))
      cents.crossJoin(broadcast(g))
        .select(col("label"), col("n"),
          round(sqrt(dot(col("cv"), col("cv"))), 4).as("centroid_norm"),
          round(dot(col("cv"), col("gv")) /
            (sqrt(dot(col("cv"), col("cv"))) * sqrt(dot(col("gv"), col("gv")))), 4)
            .as("cos_global"))
    },

    // Per-domain OUTLIER detection — the curation step after the
    // centroid card: the 3 vectors per label LEAST similar to their
    // label centroid (mislabeled / off-domain / garbage candidates
    // in a training mix). The |labels|-row centroid table broadcasts,
    // scoring is map-side, and the per-group top-k runs the salted
    // two-phase TopKPerGroup shape — no one-task-per-label ceiling
    // when a domain has billions of vectors.
    Q("d_doc_outlier", Some("""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      x AS (SELECT label, UNNEST(v) AS val, UNNEST(range(64)) AS pos
            FROM e),
      cd AS (SELECT label, pos, AVG(val) AS a FROM x GROUP BY label, pos),
      cents AS (SELECT label, list(a ORDER BY pos) AS cv
                FROM cd GROUP BY label),
      s AS (SELECT e.vec_id, e.label,
                   list_cosine_similarity(e.v, c.cv) AS cos
            FROM e JOIN cents c USING (label)),
      r AS (SELECT label, vec_id, cos,
              ROW_NUMBER() OVER (PARTITION BY label
                                 ORDER BY ROUND(cos, 8), vec_id) AS rn
            FROM s)
      SELECT label, vec_id, ROUND(cos, 4) AS cos_c
      FROM r WHERE rn <= 3
    """)) { t =>
      val e = t.embeddings.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      val cents = centroid(dimExploded(t), Seq("label"))
        .select(col("label"), col("cv"))
      val scored = e.join(broadcast(cents), "label")
        .select(col("label"), col("vec_id"),
          (dot(col("v"), col("cv")) /
            (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("cv"), col("cv")))))
            .as("cos"))
      graft.operators.TopKPerGroup.salted(scored,
          keys = Seq(col("label")),
          order = Seq(round(col("cos"), 8), col("vec_id")),
          k = 3, salt = (col("vec_id") % 32).cast("int"), rnCol = "rn")
        .select(col("label"), col("vec_id"), round(col("cos"), 4).as("cos_c"))
    },

    // FILTERED vector search — ANN under a metadata predicate (the
    // serving-side staple: "nearest neighbors WITHIN label L" /
    // tenant / language). Pre-filtering beats post-filtering when the
    // predicate is selective: the corpus scan applies the label
    // filter FIRST (pushed to parquet), so the pair scoring touches
    // only the qualifying slice — at 100 TB with a partitioned/
    // bucketed label layout that's partition pruning, not a scan.
    // Exact within the filtered slice → hash-oracled.
    Q("s_ann_filtered", Some("""
      WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE label IN (2, 3)),
      pairs AS (
        SELECT qid, vec_id, label,
               list_cosine_similarity(qv, v) AS cos
        FROM q, c WHERE vec_id <> qid)
      SELECT qid, vec_id, CAST(label AS INT) AS label,
             ROUND(cos, 4) AS cos FROM (
        SELECT qid, vec_id, label, cos,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ROUND(cos, 8) DESC, vec_id) AS rn
        FROM pairs) t
      WHERE rn <= 5
    """)) { t =>
      val corpus = t.fan(t.embeddings.filter(col("label").isin(2, 3)))
        .select(col("vec_id"), col("label").cast("int").as("label"),
          toDouble(col("embedding")).as("v"))
        .withColumn("nv", norm(col("v")))
      val queries = t.embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
        .withColumn("nq", norm(col("qv")))
      rerankTopK(corpus.crossJoin(broadcast(queries)), topk = 5,
          dedup = false)
        .join(corpus.select("vec_id", "label"), "vec_id")
        .select("qid", "vec_id", "label", "cos")
    },

    // HARD-NEGATIVE MINING — contrastive-training data construction
    // (per anchor: the most similar vectors of a DIFFERENT class are
    // the informative negatives; random negatives are trivially easy
    // and teach nothing). Distinct from s_ann_filtered's static
    // attribute pre-filter: the exclusion predicate here is relative
    // to EACH anchor's own label, so it rides the pair stream as a
    // join residual (label <> qlabel) rather than pruning the scan.
    // Same scale shape as s_ann_brute — broadcast anchor set × one
    // corpus scan, per-partition top-k, no corpus shuffle; at 100 TB
    // the anchors come from the LSH/IVF buckets like every other
    // scorer, with the label residual unchanged.
    Q("s_hard_negatives", Some("""
      WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                        CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 8),
      pairs AS (
        SELECT qid, e.vec_id AS vec_id, e.label AS label,
               list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[]))
                 AS c
        FROM q, embeddings e
        WHERE e.vec_id <> qid AND e.label <> qlabel)
      SELECT qid, vec_id, label, ROUND(c, 4) AS cos FROM (
        SELECT qid, vec_id, label, c,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ROUND(c, 8) DESC, vec_id) AS rn
        FROM pairs) t
      WHERE rn <= 5
    """)) { t =>
      val corpus = t.fan(t.embeddings)
        .select(col("vec_id"), col("label").cast("int").as("label"),
          toDouble(col("embedding")).as("v"))
        .withColumn("nv", norm(col("v")))
      val anchors = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"),
          col("label").cast("int").as("qlabel"),
          toDouble(col("embedding")).as("qv"))
        .withColumn("nq", norm(col("qv")))
      rerankTopK(
          corpus.crossJoin(broadcast(anchors))
            .filter(col("label") =!= col("qlabel")),
          topk = 5, dedup = false)
        .join(corpus.select("vec_id", "label"), "vec_id")
        .select("qid", "vec_id", "label", "cos")
    },

    // K-MEANS clustering as a first-class analytics op (the corpus-
    // organization step before semantic dedup / stratified sampling /
    // topic balancing — SemDeDup-style pipelines cluster first, then
    // operate within clusters). Reuses the IVF coarse quantizer's
    // deterministic distributed Lloyd (IvfIndex.build: broadcast
    // centroids, map-side argmin assignment, one (cell, dim) shuffle
    // per iteration) and emits the cluster card: size, mean squared
    // distance to centroid (inertia/n), and centroid norm. Lloyd
    // arithmetic is engine-specific → rows-only; the spec proves
    // partition assignment totals, determinism, and that more Lloyd
    // iterations never increase inertia.
    Q("s_kmeans", None) { t =>
      val corpus = t.fan(t.embeddings)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val (cells, centroids) = IvfIndex.build(corpus, c = 8, iters = 3)
      cells.join(broadcast(centroids
          .withColumn("cc", dot(col("cv"), col("cv")))), "cell")
        .select(col("cell"), col("cc"),
          (dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("cv"))
            + col("cc")).as("d2"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          round(avg("d2"), 4).as("mean_sq_dist"),
          round(sqrt(max("cc")), 4).as("centroid_norm"))
        .orderBy("cell")
    },

    // RANGE (radius) search — top-k's fixed-threshold sibling: ALL
    // corpus vectors with cosine ≥ τ of each query, the shape behind
    // "find every near-duplicate of this document" and recall-set
    // construction. Same no-shuffle scan as s_ann_brute (queries
    // broadcast, corpus streamed once, per-row filter — no window at
    // all, so it's strictly cheaper than top-k); at 100 TB the
    // LSH/IVF buckets in this file prune the scan the same way. The
    // threshold compares on round(c, 8) on BOTH engines so a pair
    // sitting within float-noise of τ cannot flip membership.
    Q("s_ann_range", Some("""
      WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 5),
      pairs AS (
        SELECT qid, vec_id,
               list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])) AS c
        FROM q, embeddings WHERE vec_id <> qid)
      SELECT qid, vec_id, ROUND(c, 4) AS cos
      FROM pairs WHERE ROUND(c, 8) >= 0.25
    """)) { t =>
      val corpus = vecs(t)
      val queries = t.embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
        .withColumn("nq", norm(col("qv")))
      corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          cosinePre(col("qv"), col("v"), col("nq"), col("nv")).as("c"))
        .filter(round(col("c"), 8) >= 0.25)
        .select(col("qid"), col("vec_id"), round(col("c"), 4).as("cos"))
    },

    // MAX-INNER-PRODUCT search (MIPS) — retrieval's other metric:
    // recommendation and reranking models score by raw dot product,
    // where a vector's own magnitude matters (cosine deliberately
    // erases it). Same broadcast-queries × one-corpus-scan shape as
    // s_ann_brute; at scale the standard norm-augmentation reduction
    // maps MIPS onto the cosine LSH/IVF buckets in this file. Ranking
    // key round(dot, 8) + vec_id, same float-noise fence as the
    // cosine entries.
    Q("s_ann_dot", Some("""
      WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 10),
      pairs AS (
        SELECT qid, vec_id,
               list_dot_product(qv, CAST(embedding AS DOUBLE[])) AS d
        FROM q, embeddings WHERE vec_id <> qid)
      SELECT qid, vec_id, ROUND(d, 4) AS dp FROM (
        SELECT qid, vec_id, d,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ROUND(d, 8) DESC, vec_id) AS rn
        FROM pairs) t
      WHERE rn <= 5
    """)) { t =>
      val corpus = t.fan(t.embeddings)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val queries = t.embeddings.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
        .orderBy(round(col("d"), 8).desc, col("vec_id"))
      corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), dot(col("qv"), col("v")).as("d"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("qid"), col("vec_id"), round(col("d"), 4).as("dp"))
    },

    // BINARY QUANTIZATION (sign-bit) ANN — the 64×-compression
    // serving kernel modern vector stores pair with a float re-rank:
    // each 64-dim vector compresses to ONE BIGINT of sign bits, the
    // candidate scan scores Hamming distance as a single codegen'd
    // XOR + bit_count per pair (8 bytes/vector touched — at 100 TB
    // the float arrays stay on disk for all but the re-ranked tail),
    // then the top-32 Hamming candidates per query re-rank by exact
    // cosine for the final top-5. Sign(v_i) survives the float→
    // double cast, so the oracle states the IDENTICAL Hamming
    // distance per-dimension from the raw floats — the packed-bit
    // kernel is hash-checked against the definition it compresses.
    // Ties at the Hamming cut and the final rank break on vec_id on
    // both engines.
    Q("s_ann_bq", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, ev AS qv FROM e WHERE vec_id < 10),
      ham AS (
        SELECT qid, e.vec_id,
               CAST(len(list_filter(range(1, 65),
                 i -> (qv[i] >= 0) <> (ev[i] >= 0))) AS BIGINT) AS ham
        FROM q, e WHERE e.vec_id <> qid),
      cand AS (
        SELECT qid, vec_id, ham,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ham, vec_id) AS hrn
        FROM ham),
      rr AS (
        SELECT c.qid, c.vec_id, c.ham,
               list_cosine_similarity(q.qv, e.ev) AS cs
        FROM cand c
        JOIN q ON q.qid = c.qid
        JOIN e ON e.vec_id = c.vec_id
        WHERE c.hrn <= 32)
      SELECT qid, vec_id, ham, ROUND(cs, 4) AS cos FROM (
        SELECT qid, vec_id, ham, cs,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY ROUND(cs, 8) DESC, vec_id) AS rn
        FROM rr) z
      WHERE rn <= 5
    """)) { t =>
      import org.apache.spark.sql.expressions.Window
      val corpus = vecs(t).withColumn("code", expr(
        "aggregate(transform(v, (x, i) -> IF(x >= CAST(0 AS DOUBLE)," +
          " shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))," +
          " CAST(0 AS BIGINT), (a, b) -> a | b)"))
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nv").as("nq"), col("code").as("qcode"))
      val hw = Window.partitionBy("qid")
        .orderBy(col("ham"), col("vec_id"))
      val cand = corpus.select("vec_id", "code")
        .crossJoin(broadcast(queries.select("qid", "qcode")))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("ham",
          expr("CAST(bit_count(code ^ qcode) AS BIGINT)"))
        .withColumn("hrn", row_number().over(hw))
        .filter(col("hrn") <= 32)
        .select("qid", "vec_id", "ham")
      rerankTopK(cand
        .join(corpus.select(col("vec_id"), col("v"), col("nv")),
          "vec_id")
        .join(broadcast(
          queries.select(col("qid"), col("qv"), col("nq"))), "qid"),
        topk = 5, dedup = false, carry = Seq("ham"))
    },

    // MMR DIVERSITY RERANK — maximal marginal relevance (Carbonell-
    // Goldstein): greedily pick k results trading relevance against
    // similarity to what's already picked (the dedup-at-serving-time
    // fix for near-identical top hits). Greedy is inherently
    // sequential in k — but ONLY in k: each of the k−1 rounds is one
    // co-partitioned join of remaining candidates against the picked
    // set (≤ step rows per query) + a map-combined max-sim agg + a
    // TopKPerGroup rank-1 cut, all queries advancing in parallel.
    // Candidate pools are top-8 per query, so per-round state is
    // bounded; scores compare on round(·,8) so the greedy choice
    // can't flip on float noise. Greedy trace is engine-specific →
    // rows-only; the spec pins rank-1 = pure-relevance top-1 and a
    // constructed near-dup demotion.
    Q("s_ann_mmr", Some(mmrOracle(k = 4, lam = 0.7))) { t =>
      val corpus = vecs(t)
      val queries = t.embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
        .withColumn("nq", norm(col("qv")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
        .orderBy(round(col("rel"), 8).desc, col("vec_id"))
      val cands = corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          cosinePre(col("qv"), col("v"), col("nq"), col("nv")).as("rel"),
          col("v"), col("nv"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
        .drop("rn")
      mmrSelect(cands, k = 4, lam = 0.7)
    },

    // PCA scores along the corpus's top principal component — the
    // embedding-quality staple (outlier axes, anisotropy checks,
    // whitening prep). Distributed covariance WITHOUT collecting
    // vectors: each vector contributes its centered outer product via
    // a self-join of its exploded dims — map-side-combined into at
    // most 64×65/2 (i,j) cells no matter the corpus size (the same
    // (key, dim)-cell trick as s_embed_centroid, one dim wider). The
    // 2080-cell matrix collects to the driver (O(1), like the graph
    // loops' convergence scalars) for 50 power-iteration steps on a
    // 64-vector; scores = broadcast pc1 · centered v, one map-side
    // pass. Sign fixed by the first nonzero component. Engine-
    // specific float reduction order → rows-only; the spec pins the
    // known principal axis on constructed data and the eigenvalue
    // dominance on the corpus.
    Q("s_embed_pca", None) { t =>
      Pca.scores(t)
    },

    // k-NN GRAPH with mutual-edge marking — the support structure of
    // graph-based pipelines (SemDeDup neighborhoods, mutual-kNN
    // clustering, HNSW-style navigation layers all start from it).
    // Exact top-3 edges over a bounded pool (the correctness
    // baseline, like s_ann_brute; the scale path swaps the pairing
    // for the LSH/IVF bucket join the other entries already
    // exercise), then one self-join marks RECIPROCAL edges — the
    // mutual-kNN filter that separates core members from hub
    // attractors. Hash-oracled: exact cosine, deterministic
    // (round 8, vec_id) tie-break, left-join flag.
    Q("s_knn_graph", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE vec_id < 200),
      pairs AS (
        SELECT a.vec_id AS qid, b.vec_id AS vec_id,
               list_cosine_similarity(a.v, b.v) AS c
        FROM v a, v b WHERE a.vec_id <> b.vec_id),
      knn AS (
        SELECT qid, vec_id, ROUND(c, 4) AS cos FROM (
          SELECT qid, vec_id, c,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY ROUND(c, 8) DESC, vec_id) AS rn
          FROM pairs) t WHERE rn <= 3)
      SELECT k.qid AS src, k.vec_id AS dst, k.cos AS cos,
             CAST(r.qid IS NOT NULL AS INT) AS mutual
      FROM knn k LEFT JOIN knn r
        ON r.qid = k.vec_id AND r.vec_id = k.qid
    """)) { t =>
      val (_, knn) = knnPool(t)
      knn.join(
          knn.select(col("qid").as("r_dst"), col("vec_id").as("r_src")),
          col("qid") === col("r_src") && col("vec_id") === col("r_dst"),
          "left")
        .select(col("qid").as("src"), col("vec_id").as("dst"),
          col("cos"), col("r_src").isNotNull.cast("int").as("mutual"))
    },

    // k-NN GRAPH, the SCALE leg: the same mutual-edge marking riding
    // IVF bucket candidates over the FULL corpus instead of
    // s_knn_graph's bounded-pool crossJoin. Every vector is a query:
    // probe assignment is a map pass against the broadcast 16-row
    // centroid table (shared persisted index — the s_ann_ivf cache),
    // candidates come from an EQUI-join of the probe list against
    // the cell-partitioned corpus (shuffle on cell id, Σ |cell|·
    // probes pairs — never corpus², no crossJoin/broadcast of the
    // query side, which IS the corpus here), exact cosine re-rank
    // inside the probed cells, then the same reciprocal-edge left
    // join. k-means floats are engine-specific → rows-only; the spec
    // pins edge recall ≥ 0.9 against the exact-pool graph. nprobe is
    // HIGH (12 of 16 cells, measured recall 0.96 / 0.92 / 0.74 at
    // nprobe 12 / 10 / 6) because this synthetic corpus is near-
    // isotropic — nearest neighbors sit at cos ≈ 0.5 and spread
    // across cells (the d_dedup_embed observation); a clustered
    // production corpus hits the same floor probing far fewer cells,
    // and the plan SHAPE (equi-join on cell, Σ|cell|·nprobe pairs)
    // is what this entry pins.
    Q("s_knn_graph_ivf", None) { t =>
      val (c, iters, nprobe) = (16, 2, 12)
      val dir = IvfIndex.sharedCacheDir(t.dir, c, iters)
      if (!new java.io.File(s"$dir/centroids/_SUCCESS").exists())
        IvfIndex.writeIndex(vecs(t), dir, c = c, iters = iters)
      val centroids = t.spark.read.parquet(s"$dir/centroids")
      val cells = t.spark.read.parquet(s"$dir/cells")
        .withColumn("nv", norm(col("v")))
      val queries = cells.select(col("vec_id").as("qid"),
        col("v").as("qv"), col("nv").as("nq"))
      val probed = IvfIndex.probes(queries, centroids, nprobe)
      // No dedup needed HERE: every vector lives in exactly ONE IVF
      // cell (argmin assignment), so a (qid, vec_id) pair arises at
      // most once — iff vec's cell is among qid's probes. And because
      // the candidate set is corpus × probed-cells (the LARGEST pair
      // set in the suite), the re-rank runs through the map-side-
      // combining TopKByRank aggregate instead of the window form:
      // only 3 rows per (query, partition) reach the exchange, not
      // every candidate pair (spec-pinned equal to rerankTopK).
      val knn = graft.functions.VectorFns.rerankTopKAgg(
        probed.join(cells, "cell"), topk = 3).localCheckpoint()
      knn.join(
          knn.select(col("qid").as("r_dst"), col("vec_id").as("r_src")),
          col("qid") === col("r_src") && col("vec_id") === col("r_dst"),
          "left")
        .select(col("qid").as("src"), col("vec_id").as("dst"),
          col("cos"), col("r_src").isNotNull.cast("int").as("mutual"))
    },

    // BEAM SEARCH over the kNN graph — the SEARCH leg of the graph
    // the two entries above BUILD (the HNSW/NSG serving pattern: hop
    // the neighbor graph greedily instead of scanning cells).
    // Frontier = top-`beam` nodes per query; each step expands ONE
    // graph hop (keyed equi-join frontier.node = edges.src — the
    // |Q|·beam·k candidate set, never corpus²), scores candidates
    // against the broadcast query vectors, and re-ranks
    // frontier ∪ candidates through the map-side-combining
    // TopKByRank aggregate, so only `beam` rows per (query,
    // partition) ever cross an exchange. Four spread entry points
    // seed the walk (single-seed greedy stalls on this
    // near-isotropic synthetic corpus — the same observation
    // s_knn_graph_ivf documents for nprobe). The LINK BUILD here
    // rides the bounded-pool brute graph (s_knn_graph's declared
    // baseline); at 100 TB the links come from s_knn_graph_ivf's
    // bucketed build — the SEARCH loop, which is what this entry
    // pins, is unchanged either way. Float-iterative → rows-only;
    // the spec pins recall ≥ 0.75 vs the exact top-3 (measured
    // 0.85) and exact per-query row counts.
    Q("s_knn_beam", None) { t =>
      val (beam, steps, topk) = (12, 5, 3)
      val (pool, knn) = knnPool(t)
      val qsAll = pool.select(col("vec_id").as("qid"),
        col("v").as("qv"), col("nv").as("nq"))
      // SYMMETRIZED links (HNSW keeps bidirectional connectivity —
      // a directed k-NN edge is followable from either end).
      val knnE = knn
        .select(col("qid").as("src"), col("vec_id").as("dst"))
      val edges = knnE.unionByName(
          knnE.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint()
      val queries = qsAll.filter(col("qid") % 10 === 7).localCheckpoint()
      def score(cand: DataFrame): DataFrame =
        cand.join(pool, "vec_id")
          .join(broadcast(queries), "qid")
          .select(col("qid"), col("vec_id"),
            round(cosinePre(col("qv"), col("v"), col("nq"), col("nv")),
              8).as("c"))
      var frontier = score(queries.select("qid")
        .crossJoin(broadcast(pool.filter(
          col("vec_id").isin(1L, 53L, 101L, 151L)).select("vec_id"))))
        .localCheckpoint()
      for (_ <- 1 to steps) {
        val cand = frontier
          .join(edges, frontier("vec_id") === edges("src"))
          .select(col("qid"), col("dst").as("vec_id")).distinct()
        frontier = frontier.unionByName(score(cand))
          // identical pairs rescore identically (round-8 cosine), so
          // the arbitrary-row dedup is deterministic here
          .dropDuplicates("qid", "vec_id")
          .groupBy("qid")
          .agg(graft.functions.TopKByRank.col(col("c"), col("vec_id"),
            col("c"), beam).as("tk"))
          .select(col("qid"), explode(col("tk")).as("e"))
          .select(col("qid"), col("e.id").as("vec_id"),
            col("e.payload").as("c"))
        // One checkpoint per hop: chaining two hops per job was
        // measured SLOWER normalized (the lineage re-runs two TopK
        // aggregations per job) — the frontier is tiny, scheduling
        // is the floor either way.
        frontier = frontier.localCheckpoint()
      }
      frontier.filter(col("vec_id") =!= col("qid"))
        .groupBy("qid")
        .agg(graft.functions.TopKByRank.col(col("c"), col("vec_id"),
          col("c"), topk).as("tk"))
        .select(col("qid"), explode(col("tk")).as("e"))
        .select(col("qid"), col("e.id").as("vec_id"),
          round(col("e.payload"), 4).as("cos"))
    },

    // Incremental IVF maintenance — add-batch without retrain + the
    // drift card that says WHEN to retrain (IvfIndex.appendToIndex /
    // driftCard; no reference analog — the pipeline-mandate ANN
    // scale path's serving-index story). The staged index: base
    // generation (vec_id % 5 != 0) trained normally, the held-out
    // 20% appended at FIXED centroids — one broadcast argmin over
    // the batch only, never a corpus re-read. Staging is
    // content-fingerprint-keyed and marker-gated so re-runs are
    // read-only (append is not idempotent; the marker is written
    // only after the append lands). The card: per cell, base/new
    // counts and inertia, growth ratio, and the retrain flag
    // (growth > 1.5 or a base-less cell). Float-iterative k-means →
    // rows-only; IvfIndexSpec proves probe-after-append equals
    // probe-of-rebuilt-at-fixed-centroids and pins the card
    // arithmetic on a constructed index.
    Q("s_ivf_drift", None) { t =>
      val F = graft.sources.Formats
      val (c, iters) = (16, 2)
      val dir = F.cacheDir(
        s"/tmp/graft_ivfdrift_c${c}_i${iters}_${F.sanitize(t.dir)}",
        F.contentFingerprint(s"${t.dir}/embeddings.parquet"))
      val marker = new java.io.File(s"$dir/_APPENDED")
      if (!marker.exists()) {
        F.deleteRecursively(new java.io.File(dir))
        val all = vecs(t)
        IvfIndex.writeIndex(all.filter(col("vec_id") % 5 =!= 0),
          dir, c = c, iters = iters)
        IvfIndex.appendToIndex(t.spark, dir,
          all.filter(col("vec_id") % 5 === 0))
        require(marker.createNewFile(), s"marker exists at $dir")
      }
      IvfIndex.driftCard(t.spark, dir,
          isNew = col("vec_id") % 5 === 0, growthCap = 1.5)
        .orderBy("cell")
    },

    // Retrain-and-swap — the drift card's second half (no reference
    // analog; the serving-index maintenance loop the pipeline
    // mandate implies). Staging (marker-gated, content-fingerprint-
    // keyed, all generations retained so re-runs are read-only):
    // gen_1 trained on the base corpus; a DRIFTED batch (new ids,
    // every component shifted +3.0 — a distribution the fixed
    // centroids cannot summarize) appended at fixed centroids;
    // retrainAndSwap reads gen_1's full current corpus, trains
    // fresh centroids, writes gen_2 and atomically flips CURRENT;
    // a SECOND same-shaped drifted batch then appends to gen_2.
    // The card tells the story: the first drifted append against
    // gen_1's centroids flags red (growth > cap / base-less cells);
    // the same class of append against the RETRAINED centroids is
    // green (they now summarize the shifted region) — retraining
    // measurably absorbed the drift, not just renamed it. Epoch
    // rule: driftCard's isNew marks rows appended since the LAST
    // (re)train, so immediately post-swap the new-rows set is empty
    // by definition. Float-iterative k-means → rows-only;
    // IvfIndexSpec proves the atomic swap, probe continuity across
    // the flip (old resolved dir serves identical results), recall
    // no worse than the drifted generation's, and the red→green
    // flag drop on this exact staging.
    Q("s_ivf_retrain", None) { t =>
      val F = graft.sources.Formats
      val (c, iters) = (16, 2)
      val root = F.cacheDir(
        s"/tmp/graft_ivfretrain_c${c}_i${iters}_${F.sanitize(t.dir)}",
        F.contentFingerprint(s"${t.dir}/embeddings.parquet"))
      val marker = new java.io.File(s"$root/_STAGED")
      def shifted(offset: Long) = vecs(t)
        .filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + offset).as("vec_id"),
          expr("transform(v, x -> x + 3.0d)").as("v"))
      if (!marker.exists()) {
        F.deleteRecursively(new java.io.File(root))
        IvfIndex.initServing(
          vecs(t).filter(col("vec_id") % 5 =!= 0).select("vec_id", "v"),
          root, c = c, iters = iters)
        IvfIndex.appendToServing(t.spark, root, shifted(1000000L))
        val gen2 = IvfIndex.retrainAndSwap(t.spark, root, c, iters)
        require(gen2 == "gen_2", s"unexpected generation $gen2")
        IvfIndex.appendToServing(t.spark, root, shifted(2000000L))
        require(marker.createNewFile(), s"marker exists at $root")
      }
      // Read-only from here (every generation is retained): the
      // pre-retrain card against gen_1, the post-retrain card
      // against the serving generation — one scan each.
      def flags(dir: String, isNew: org.apache.spark.sql.Column) =
        IvfIndex.driftCard(t.spark, dir, isNew, growthCap = 1.5)
          .agg(sum(when(col("n_new") > 0, 1).otherwise(0))
              .cast("long").as("cells_new"),
            sum(col("retrain")).cast("long").as("flagged"))
          .head()
      val red = flags(s"$root/gen_1", col("vec_id") >= 1000000L)
      val green = flags(IvfIndex.servingDir(root),
        col("vec_id") >= 2000000L)
      import t.spark.implicits._
      Seq(
        ("1_drifted_append", "gen_1", red.getLong(0), red.getLong(1)),
        ("2_retrain_swap", IvfIndex.currentGen(root), 0L, 0L),
        ("3_post_retrain_append", IvfIndex.currentGen(root),
          green.getLong(0), green.getLong(1)))
        .toDF("stage", "serving_gen", "cells_with_new", "flagged")
    },

    // Drift DASHBOARD series — the registry-visible leg of
    // e_stream_drift (Streams.driftDashboardSink): one metrics row
    // per ingest micro-batch, persisted exactly-once beside the
    // serving layout. Staging (marker-gated, content-fingerprint-
    // keyed, read-only on re-run): gen_1 trained on the base corpus,
    // then the CLOSED auto-retrain loop runs two batches through the
    // dashboard sink — a same-distribution quiet batch (sub-gate
    // flagged mass, no flip) and a +3.0-shifted burst (flagged mass
    // over the gate → compaction to gen_2, deltas retired) — each
    // appending its truthful observation row. The entry reads the
    // series back: the exact table a serving fleet's dashboard
    // renders (generation lineage, new-row mass, flagged share,
    // retrain ticks). Mass values ride the float-iterative k-means
    // cells → rows-only; StreamingSpec drives the same loop live
    // and pins every row including the replay-rewrite semantics.
    Q("s_drift_series", None) { t =>
      val F = graft.sources.Formats
      val (c, iters) = (16, 2)
      val root = F.cacheDir(
        s"/tmp/graft_driftseries_c${c}_i${iters}_${F.sanitize(t.dir)}",
        F.contentFingerprint(s"${t.dir}/embeddings.parquet"))
      val marker = new java.io.File(s"$root/_STAGED")
      val (serveRoot, deltaDir, metricsDir) =
        (s"$root/serving", s"$root/delta", s"$root/metrics")
      if (!marker.exists()) {
        F.deleteRecursively(new java.io.File(root))
        new java.io.File(root).mkdirs()
        val all = vecs(t).select("vec_id", "v")
        IvfIndex.initServing(all.filter(col("vec_id") % 5 =!= 0),
          serveRoot, c = c, iters = iters)
        val sink = graft.streaming.Streams.driftDashboardSink(
          serveRoot, deltaDir, growthCap = 1.5, flagFrac = 0.5,
          metricsDir) _
        sink(all.filter(col("vec_id") % 5 === 0)
          .filter(col("vec_id") % 3 === 0), 0L)
        sink(all.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            expr("transform(v, x -> x + 3.0d)").as("v")), 1L)
        require(marker.createNewFile(), s"marker exists at $root")
      }
      t.spark.read.parquet(metricsDir)
        .select(col("batch_id").cast("long").as("batch_id"),
          col("gen_before"), col("gen_after"), col("mass_new"),
          col("mass_flagged"), col("retrained").cast("int")
            .as("retrained"))
        .orderBy("batch_id")
    },
  )

  /** Unrolled MMR oracle (oracled since r8): the greedy selection is
    * deterministic under the same round(·,8) ranking fences the
    * engine uses, so k−1 unrolled steps reproduce it exactly —
    * step r rescoses the unpicked pool against the union of previous
    * picks with MAX-sim via a correlated subquery. λ and (1−λ) are
    * rendered as the exact IEEE doubles the engine multiplies by
    * (1−0.7 is NOT 0.3 in binary), cast to DOUBLE so DuckDB never
    * routes them through DECIMAL arithmetic. */
  private def mmrOracle(k: Int, lam: Double): String = {
    def picked(r: Int) = (1 to r)
      .map(i => s"SELECT qid, vec_id, rel, ve, $i AS rank FROM p$i")
      .mkString(" UNION ALL ")
    val steps = (2 to k).map { r =>
      s"""s$r AS (
        SELECT c.qid, c.vec_id, c.rel, c.ve,
               (SELECT MAX(list_cosine_similarity(c.ve, p.ve))
                FROM (${picked(r - 1)}) p WHERE p.qid = c.qid) AS msim
        FROM cands c
        WHERE NOT EXISTS (SELECT 1 FROM (${picked(r - 1)}) x
                          WHERE x.qid = c.qid AND x.vec_id = c.vec_id)),
      p$r AS (SELECT qid, vec_id, rel, ve FROM (
        SELECT qid, vec_id, rel, ve,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY ROUND(CAST($lam AS DOUBLE) * rel -
                   CAST(${1 - lam} AS DOUBLE) * msim, 8) DESC, vec_id)
                 AS rn
        FROM s$r) t WHERE rn = 1)"""
    }.mkString(",\n      ")
    s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < 5),
      pool AS (
        SELECT qid, vec_id, list_cosine_similarity(qv, ve) AS rel, ve,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY ROUND(list_cosine_similarity(qv, ve), 8)
                   DESC, vec_id) AS rn
        FROM q, v WHERE vec_id <> qid),
      cands AS (SELECT qid, vec_id, rel, ve FROM pool WHERE rn <= 8),
      p1 AS (SELECT qid, vec_id, rel, ve FROM pool WHERE rn = 1),
      $steps
      SELECT qid, rank, vec_id, ROUND(rel, 4) AS rel
      FROM (${picked(k)}) f
    """
  }

  /** Greedy MMR over per-query candidate pools. `cands` columns:
    * (qid, vec_id, rel, v, nv). Round r: score = λ·rel − (1−λ)·
    * max sim to the picked set, rank-1 per query wins (round(·,8) +
    * vec_id tie-break). Output: (qid, rank, vec_id, rel). */
  def mmrSelect(cands0: DataFrame, k: Int, lam: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The pool is re-read by every greedy round (anti-join + rescore)
    // — materialize it once instead of re-running the candidate scan
    // k times.
    val cands = cands0.localCheckpoint()
    val w1 = Window.partitionBy("qid")
      .orderBy(round(col("rel"), 8).desc, col("vec_id"))
    var selected = cands.withColumn("rank", row_number().over(w1))
      .filter(col("rank") === 1)
      .localCheckpoint()
    for (step <- 2 to k) {
      val sel = selected.select(col("qid"), col("v").as("sv"),
        col("nv").as("snv"))
      val rem = cands.join(selected.select("qid", "vec_id"),
        Seq("qid", "vec_id"), "left_anti")
      val scored = rem.join(sel, "qid")
        .select(col("qid"), col("vec_id"), col("rel"), col("v"),
          col("nv"),
          cosinePre(col("v"), col("sv"), col("nv"), col("snv")).as("sim"))
        .groupBy("qid", "vec_id")
        .agg(first("rel").as("rel"), first("v").as("v"),
          first("nv").as("nv"), max("sim").as("msim"))
        .withColumn("score",
          lit(lam) * col("rel") - lit(1 - lam) * col("msim"))
      val wS = Window.partitionBy("qid")
        .orderBy(round(col("score"), 8).desc, col("vec_id"))
      val pick = scored.withColumn("rn", row_number().over(wS))
        .filter(col("rn") === 1)
        .select(col("qid"), col("vec_id"), col("rel"), col("v"),
          col("nv"), lit(step).as("rank"))
      selected = selected.union(pick).localCheckpoint()
    }
    selected.select(col("qid"), col("rank"), col("vec_id"),
      round(col("rel"), 4).as("rel"))
  }
}
