package graft.text

import graft.{Q, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis suite for LLM data pipelines: language-ID, quality
  * scoring, token counting. Pure map-side column work — embarrassingly
  * parallel at any scale, no shuffle at all (the plans are scan →
  * project). Oracles reproduce every heuristic in DuckDB SQL.
  */
object TextQueries {

  /** Per-session memo of the corpus bigram-LM per-doc scores — the
    * (doc_id, n_bg, raw mean bigram log-prob) frame both t_lm_score
    * and t_ppl_bucket round and consume (4dp filter card / 6dp
    * tercile cut). The training+scoring pass (normalize → bigram
    * explode → LM count shuffle → broadcast-scored per-doc agg) ran
    * once per entry AND twice inside t_ppl_bucket's one plan (the
    * tercile aggregate and the bucket pass both read the scores);
    * the checkpoint collapses all of it to one pass per session. */
  private val lmScoreMemo = new graft.tools.SessionMemo[String,
    org.apache.spark.sql.DataFrame]

  private def lmScores(t: Tables): org.apache.spark.sql.DataFrame =
    lmScoreMemo.get(t.spark, t.dir) {
      val docs = t.documents
        .select(col("doc_id"), TextFns.normalize(col("text")).as("s"))
      // Guarded like TextFns.charShingles: Spark's sequence(1, 0)
      // COUNTS DOWN (default step -1), so an unguarded len-1 upper
      // bound would emit phantom bigrams for ≤1-char docs where the
      // oracle's generate_series is empty.
      val bg = t.fan(docs).select(col("doc_id"),
        explode(expr(
          "CASE WHEN length(s) >= 2 THEN " +
            "transform(sequence(1, length(s) - 1), i -> substring(s, i, 2)) " +
            "ELSE array() END"))
          .as("b"))
      val lm = bg.groupBy("b").agg(count(lit(1)).as("c"))
      val tot = lm.agg(sum("c").as("total"), count(lit(1)).as("v"))
      val logp = log((col("c") + 1) /
        (col("total") + col("v")).cast("double"))
      bg.join(broadcast(lm), "b").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bg"), avg(logp).as("lp_raw"))
        .localCheckpoint()
    }

  private def markerCount(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(text, lit(s"(?i)\\b(${words.mkString("|")})\\b"),
      lit(0)))

  private val enWords = Seq("the", "and", "of", "to", "a", "in")
  private val esWords = Seq("el", "la", "de", "que", "los", "una")
  private val deWords = Seq("der", "die", "und", "ist", "ein", "nicht")

  private def sqlMarker(words: Seq[String]): String =
    s"CAST(LEN(regexp_extract_all(text, '(?i)\\b(${words.mkString("|")})\\b')) AS INT)"

  val all: Seq[Q] = Seq(

    // Language-ID: stopword-marker scoring with fixed tie-break
    // (en > es > de > und). Deterministic n-gram heuristic.
    Q("t_lang_id", Some(s"""
      SELECT doc_id, lang, s_en, s_es, s_de,
             CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 THEN 'und'
                  WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                  WHEN s_es >= s_de THEN 'es'
                  ELSE 'de' END AS lang_pred
      FROM (SELECT doc_id, lang,
              ${sqlMarker(enWords)} AS s_en,
              ${sqlMarker(esWords)} AS s_es,
              ${sqlMarker(deWords)} AS s_de
            FROM documents) t
    """)) { t =>
      t.documents
        .select(col("doc_id"), col("lang"),
          markerCount(col("text"), enWords).as("s_en"),
          markerCount(col("text"), esWords).as("s_es"),
          markerCount(col("text"), deWords).as("s_de"))
        .withColumn("lang_pred",
          when(col("s_en") === 0 && col("s_es") === 0 && col("s_de") === 0,
            "und")
            .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"),
              "en")
            .when(col("s_es") >= col("s_de"), "es")
            .otherwise("de"))
    },

    // Quality scoring: length, token stats, punctuation/whitespace
    // ratios, stopword density + a composite keep-flag.
    Q("t_quality", Some("""
      SELECT doc_id, n_chars_q, n_tokens,
             ROUND(CAST(n_alpha AS DOUBLE) / n_chars_q, 4) AS alpha_ratio,
             ROUND(CAST(n_punct AS DOUBLE) / n_chars_q, 4) AS punct_ratio,
             ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
             ROUND(CAST(n_chars_q - n_ws AS DOUBLE) / n_tokens, 4) AS mean_tok_len,
             CAST(n_chars_q >= 100 AND n_tokens >= 10 AS INT) AS keep_flag
      FROM (SELECT doc_id,
              CAST(LENGTH(text) AS INT) AS n_chars_q,
              CAST(LEN(regexp_extract_all(text, '(\S+)', 1)) AS INT) AS n_tokens,
              CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
              CAST(LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9\s]', '', 'g')) AS INT) AS n_punct,
              CAST(LEN(regexp_extract_all(text, '(?i)\b(the|and|of|to|a|in)\b')) AS INT) AS n_stop,
              CAST(LENGTH(REGEXP_REPLACE(text, '\S', '', 'g')) AS INT) AS n_ws
            FROM documents) t
      WHERE n_tokens > 0
    """)) { t =>
      // Single-pass counters via the codegen TextStats kernel — the
      // five-regex formulation cost ~11 s at sf0.1; this is one scan.
      t.documents
        .select(col("doc_id"), expr("text_stats(text)").as("s"),
          markerCount(col("text"), Seq("the", "and", "of", "to", "a", "in"))
            .as("n_stop"))
        .select(col("doc_id"),
          col("s.n_chars").as("n_chars_q"),
          col("s.n_tokens").as("n_tokens"),
          col("s.n_alpha").as("n_alpha"),
          col("s.n_punct").as("n_punct"),
          col("n_stop"),
          col("s.n_ws").as("n_ws"))
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("n_chars_q"), col("n_tokens"),
          round(col("n_alpha").cast("double") / col("n_chars_q"), 4)
            .as("alpha_ratio"),
          round(col("n_punct").cast("double") / col("n_chars_q"), 4)
            .as("punct_ratio"),
          round(col("n_stop").cast("double") / col("n_tokens"), 4)
            .as("stop_ratio"),
          round((col("n_chars_q") - col("n_ws")).cast("double") /
            col("n_tokens"), 4).as("mean_tok_len"),
          (col("n_chars_q") >= 100 && col("n_tokens") >= 10).cast("int")
            .as("keep_flag"))
    },

    // End-to-end corpus cleaning: quality gate (length/token floor)
    // → exact dedup keeping the smallest doc_id → the table a shard
    // writer consumes (ShardWriter lays it out as fixed-size shards;
    // spec-verified). Composes the kernels: one TextStats pass + one
    // md5 groupBy.
    Q("t_pipeline", Some("""
      WITH scored AS (
        SELECT doc_id, lang, source,
               CAST(LENGTH(text) AS INT) AS n_chars_p,
               CAST(LEN(regexp_extract_all(text, '(\S+)', 1)) AS INT) AS n_tokens,
               MD5(text) AS fp
        FROM documents),
      kept AS (SELECT * FROM scored WHERE n_chars_p >= 100 AND n_tokens >= 10),
      dedup AS (SELECT fp, MIN(doc_id) AS keep_id FROM kept GROUP BY fp)
      SELECT k.doc_id, k.lang, k.source, k.n_chars_p, k.n_tokens
      FROM kept k JOIN dedup d ON k.doc_id = d.keep_id
    """)) { t =>
      val scored = t.documents.select(col("doc_id"), col("lang"),
          col("source"), expr("text_stats(text)").as("s"),
          md5(col("text").cast("binary")).as("fp"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("s.n_chars").as("n_chars_p"),
          col("s.n_tokens").as("n_tokens"), col("fp"))
      val kept = scored
        .filter(col("n_chars_p") >= 100 && col("n_tokens") >= 10)
      val dedup = kept.groupBy("fp").agg(min(col("doc_id")).as("keep_id"))
      kept.join(dedup, kept("doc_id") === dedup("keep_id"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars_p"), col("n_tokens"))
    },

    // Consecutive-repeat compression — the REPAIR op beside
    // t_quality_rep's repetition MEASUREMENT (the RefinedWeb/Gopher
    // cleanup family: collapse stutter runs like "batch batch batch"
    // instead of dropping the whole document). Entirely a per-row
    // codegen'd HOF — split → indexed filter keeping tokens whose
    // predecessor differs → md5 of the re-joined text — so at 100 TB
    // this is a map-only pass fused into the scan stage: NO shuffle,
    // no window, no lag. Both engines state the same indexed-lambda
    // filter (Spark 0-based with element_at(ws, i) as predecessor,
    // DuckDB 1-based with ws[i-1]); md5 of the identically re-joined
    // string makes the full cleaned text hash-checked without
    // shipping it through the driver compare.
    Q("t_dedup_runs", Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
      c AS (SELECT doc_id, ws,
                   list_filter(ws,
                     (x, i) -> i = 1 OR x <> ws[i - 1]) AS kept
            FROM w)
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(kept) AS BIGINT) AS n_kept,
             md5(array_to_string(kept, ' ')) AS cleaned_md5
      FROM c
    """)) { t =>
      t.documents
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          expr("filter(ws, (x, i) -> " +
            "IF(i = 0, true, x != element_at(ws, i)))").as("kept"))
        .select(col("doc_id"), col("n_tokens"),
          size(col("kept")).cast("long").as("n_kept"),
          md5(concat_ws(" ", col("kept"))).as("cleaned_md5"))
    },

    // REPETITION quality signals (the Gopher filter family): type-
    // token ratio, most-frequent-word share, most-frequent-bigram
    // share, and the composite keep flag a pretraining pipeline
    // gates on. Degenerate machine-generated text (keyword stuffing,
    // template loops) shows up as a high top-gram share long before
    // perplexity filters see it. Scale: grams shuffle on (doc_id,
    // gram) with map-side partial counts — per-doc state only,
    // embarrassingly parallel across docs.
    Q("t_quality_rep", Some("""
      WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws
                 FROM documents),
      tok AS (SELECT doc_id, UNNEST(ws) AS tok FROM w WHERE LEN(ws) >= 2),
      tf AS (SELECT doc_id, tok, COUNT(*) AS n FROM tok GROUP BY doc_id, tok),
      ts AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tok, MAX(n) AS max_tok,
                    COUNT(*) AS n_types FROM tf GROUP BY doc_id),
      b AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
            FROM w, UNNEST(generate_series(1, LEN(ws) - 1)) AS t(i)
            WHERE LEN(ws) >= 2),
      bf AS (SELECT doc_id, bg, COUNT(*) AS n FROM b GROUP BY doc_id, bg),
      bs AS (SELECT doc_id, SUM(n) AS n_bg, MAX(n) AS max_bg FROM bf GROUP BY doc_id)
      SELECT ts.doc_id, n_tok,
             ROUND(n_types / CAST(n_tok AS DOUBLE), 4) AS ttr,
             ROUND(max_tok / CAST(n_tok AS DOUBLE), 4) AS top_word_frac,
             ROUND(max_bg / CAST(n_bg AS DOUBLE), 4) AS top_bigram_frac,
             CAST(max_tok / CAST(n_tok AS DOUBLE) <= 0.12
                  AND max_bg / CAST(n_bg AS DOUBLE) <= 0.05 AS INT) AS keep_rep
      FROM ts JOIN bs ON ts.doc_id = bs.doc_id
    """)) { t =>
      // Single-pass RepStats kernel (functions/RepStats.scala): the
      // explode + two (doc_id, gram) shuffle formulation cost ~7 s at
      // sf0.1 for state that never needs to leave the row; this is
      // scan → project.
      t.documents
        .select(col("doc_id"), expr("rep_stats(text)").as("s"))
        .filter(col("s.n_tok") >= 2)
        .select(col("doc_id"),
          col("s.n_tok").cast("bigint").as("n_tok"),
          round(col("s.n_types") / col("s.n_tok").cast("double"), 4)
            .as("ttr"),
          round(col("s.max_tok") / col("s.n_tok").cast("double"), 4)
            .as("top_word_frac"),
          round(col("s.max_bg") / col("s.n_bg").cast("double"), 4)
            .as("top_bigram_frac"),
          (col("s.max_tok") / col("s.n_tok").cast("double") <= 0.12 &&
            col("s.max_bg") / col("s.n_bg").cast("double") <= 0.05)
            .cast("int").as("keep_rep"))
    },

    // Sequence PACKING for training (concat-then-chunk): documents
    // are laid out in deterministic doc_id order and sliced into
    // fixed 2048-token sequences; each doc reports its global token
    // offset and the first/last sequence it lands in. The global
    // running offset is the scale crux — a single ORDER BY window is
    // ONE task at 100 TB — so it runs as the classic two-phase
    // distributed prefix sum: (1) per-range partial cumsum via a
    // PARTITIONed window (range = 100 docs here; any bounded range
    // works), (2) range TOTALS — |docs|/range rows, thousands not
    // billions — prefix-summed in the tiny second phase and joined
    // back (broadcast). The oracle states the same quantity as the
    // naive single window.
    Q("t_pack", Some("""
      WITH s AS (SELECT doc_id,
               CAST(LEN(regexp_extract_all(text, '(\S+)', 1)) AS BIGINT) AS n_tok
             FROM documents),
      o AS (SELECT doc_id, n_tok,
              CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS tok_offset
            FROM s WHERE n_tok > 0)
      SELECT doc_id, n_tok, tok_offset,
             CAST(tok_offset // 2048 AS BIGINT) AS seq_first,
             CAST((tok_offset + n_tok - 1) // 2048 AS BIGINT) AS seq_last
      FROM o
    """)) { t =>
      val s = t.documents
        .select(col("doc_id"),
          expr("text_stats(text)").getField("n_tokens").cast("bigint")
            .as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("rng", expr("doc_id div 100"))
      graft.operators.PrefixSum.sumBefore(s, rangeCol = "rng",
          orderCols = Seq("doc_id"), valueCol = "n_tok",
          out = "tok_offset")
        .select(col("doc_id"), col("n_tok"), col("tok_offset"),
          expr("tok_offset div 2048").as("seq_first"),
          expr("(tok_offset + n_tok - 1) div 2048").as("seq_last"))
    },

    // PII-safe metadata: irreversible masking for display plus a
    // salted-hash pseudonym that keeps joinability (same input → same
    // token, so dedup/joins work without cleartext), and value
    // generalization (balance banding) — the transformation pass
    // before data leaves the trusted zone. Pure map-side projection,
    // no shuffle at any scale.
    Q("t_pii_mask", Some("""
      SELECT c_custkey,
             CONCAT(SUBSTR(c_name, 1, 2),
                    REPEAT('*', GREATEST(LENGTH(c_name) - 2, 0))) AS name_masked,
             SUBSTR(sha256(CONCAT('pepper42:', c_name)), 1, 16) AS name_token,
             CAST(FLOOR(c_acctbal / 500) * 500 AS BIGINT) AS acctbal_band,
             c_mktsegment
      FROM customer
    """)) { t =>
      t.customer.select(col("c_custkey"),
        concat(substring(col("c_name"), 1, 2),
          expr("repeat('*', greatest(length(c_name) - 2, 0))"))
          .as("name_masked"),
        substring(sha2(concat(lit("pepper42:"), col("c_name")), 256), 1, 16)
          .as("name_token"),
        (floor(col("c_acctbal") / 500) * 500).cast("bigint")
          .as("acctbal_band"),
        col("c_mktsegment"))
    },

    // Deterministic corpus SHUFFLE: every training run wants the
    // corpus in a pseudo-random but REPRODUCIBLE order (data order is
    // part of the training recipe). The permutation key is the same
    // multiplicative-hash coin as d_mix_sample — no engine RNG, so
    // the oracle reproduces the exact order — and the gapless global
    // position comes from the two-phase distributed prefix count
    // (q_id_assign's shape) over coin-range groups: no global-window
    // task at any scale.
    Q("t_shuffle", Some(s"""
      WITH c AS (SELECT doc_id,
                        ${TextFns.knuthCoinSql("doc_id")} AS coin
                 FROM documents)
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY coin, doc_id) - 1 AS pos
      FROM c
    """)) { t =>
      val c = t.documents.select(col("doc_id"),
          graft.functions.TextFns.knuthCoin(col("doc_id")).as("coin"))
        .withColumn("grp", expr("coin div 33554432")) // 2^25 → 128 ranges
      graft.operators.PrefixSum.rowNumberBefore(c, rangeCol = "grp",
          orderCols = Seq("coin", "doc_id"), out = "pos")
        .select("doc_id", "pos")
    },

    // URL canonicalization (web-crawl curation): parse host / path /
    // query and strip tracking parameters (utm_*) so syntactically
    // different URLs of the same resource dedup together — the step
    // before URL-level dedup of a crawl. The corpus has no URL
    // column, so one is derived deterministically per doc; the engine
    // uses the native parse_url (java.net.URI semantics, codegen'd),
    // the oracle the equivalent anchored regexes. Pure map-side.
    Q("t_url_normalize", Some("""
      WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || lang || '/'
                 || doc_id || '?utm_source=feed&id=' || doc_id
                 || '&utm_medium=x&ref=' || source AS url
        FROM documents),
      p AS (
        SELECT doc_id,
               regexp_extract(url, '^https?://([^/]+)', 1) AS host,
               regexp_extract(url, '^https?://[^/]+([^?]*)', 1) AS path,
               regexp_replace(
                 regexp_replace(regexp_extract(url, '\?(.*)$', 1),
                                '&?utm_[^&]*', '', 'g'),
                 '^&', '') AS clean_query
        FROM u)
      SELECT doc_id, host, path, clean_query,
             'https://' || host || path || '?' || clean_query AS canon_url
      FROM p
    """)) { t =>
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), col("lang"), lit("/"), col("doc_id"),
        lit("?utm_source=feed&id="), col("doc_id"),
        lit("&utm_medium=x&ref="), col("source"))
      t.documents.select(col("doc_id"), url.as("url"))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          regexp_replace(
            regexp_replace(parse_url(col("url"), lit("QUERY")),
              "&?utm_[^&]*", ""),
            "^&", "").as("clean_query"))
        .withColumn("canon_url",
          concat(lit("https://"), col("host"), col("path"), lit("?"),
            col("clean_query")))
    },

    // Document chunking with overlap — the RAG / context-window prep
    // step every training pipeline runs before embedding or packing:
    // fixed 240-char windows on a 180-char stride (60-char overlap so
    // no boundary sentence is lost), chunk offsets derivable from
    // (doc_id, chunk_idx). Pure map-side sequence-explode + substring
    // — scan → generate → project, zero shuffle at any corpus size;
    // chunk count per doc is ceil(len/stride), so output scales
    // linearly with corpus bytes, never quadratically. DuckDB states
    // the identical window arithmetic via unnest(range(...)).
    // (Guard len >= 1: Spark's `div` truncates toward zero while
    // DuckDB's `//` floors, so an empty doc would diverge.)
    Q("t_chunk", Some("""
      SELECT doc_id,
             CAST(i AS BIGINT) AS chunk_idx,
             substr(text, CAST(i * 180 + 1 AS BIGINT), 240) AS chunk_text,
             CAST(length(substr(text, CAST(i * 180 + 1 AS BIGINT), 240))
                  AS BIGINT) AS chunk_len
      FROM (SELECT doc_id, text,
                   unnest(range(0,
                     CAST((length(text) - 1) // 180 AS BIGINT) + 1)) AS i
            FROM documents WHERE length(text) >= 1)
    """)) { t =>
      t.documents.filter(length(col("text")) >= 1)
        .select(col("doc_id"), col("text"),
          explode(expr(
            "sequence(bigint(0), (bigint(length(text)) - 1) div 180)"))
            .as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          expr("substring(text, int(chunk_idx * 180 + 1), 240)")
            .as("chunk_text"))
        .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
    },

    // Token counting: whitespace tokens + a BPE-ish regex
    // segmentation (letter runs / single digits / punctuation marks).
    Q("t_tokens", Some("""
      SELECT doc_id,
             CAST(LEN(regexp_extract_all(text, '(\S+)', 1)) AS INT) AS ws_tokens,
             CAST(LEN(regexp_extract_all(text, '([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])', 1)) AS INT) AS bpe_tokens,
             CAST(CEIL(LENGTH(text) / 4.0) AS INT) AS byte_est_tokens
      FROM documents
    """)) { t =>
      // Same single-pass kernel; the two regexp_extract_all scans cost
      // ~6 s at sf0.1.
      t.documents.select(col("doc_id"), expr("text_stats(text)").as("s"))
        .select(col("doc_id"),
          col("s.n_tokens").as("ws_tokens"),
          col("s.bpe_tokens").as("bpe_tokens"),
          ceil(col("s.n_chars") / 4.0).cast("int").as("byte_est_tokens"))
    },

    // Language-model quality score (the KenLM-filter analog every
    // crawl pipeline runs): a char-bigram unigram-smoothed LM is
    // trained on the corpus itself and every document is scored by
    // its mean bigram log-probability; low scores = gibberish /
    // boilerplate. Scale: training is ONE map-side-combined shuffle
    // keyed by bigram (the LM table is ≤ |alphabet|² ≈ 1.3k rows —
    // tiny at any corpus size); the table then BROADCASTS and the
    // scoring pass is pure map-side — the per-doc join never
    // shuffles documents. Add-one smoothing keeps the estimator
    // defined for unseen bigrams.
    Q("t_lm_score", Some("""
      WITH n AS (SELECT doc_id,
               TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS s
             FROM documents),
      bg AS (SELECT doc_id, SUBSTR(s, i, 2) AS b
             FROM n, UNNEST(generate_series(1, LEN(s) - 1)) AS g(i)),
      lm AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b),
      tot AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM lm)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bg,
             ROUND(AVG(LN((lm.c + 1) / CAST(total + v AS DOUBLE))), 4) AS lp,
             CAST(AVG(LN((lm.c + 1) / CAST(total + v AS DOUBLE))) > -7.0
                  AS INT) AS keep_lm
      FROM bg JOIN lm USING (b), tot
      GROUP BY doc_id
    """)) { t =>
      lmScores(t).select(col("doc_id"), col("n_bg"),
        round(col("lp_raw"), 4).as("lp"),
        (col("lp_raw") > -7.0).cast("int").as("keep_lm"))
    },

    // CCNet-style perplexity bucketing — the canonical LM-data split:
    // score every document with the corpus bigram LM (t_lm_score's
    // broadcast-scoring pass), cut the corpus into head/middle/tail
    // at the lp terciles, report each bucket's size and score mass.
    // Scale: the tercile boundaries are ONE exact-percentile
    // aggregate (a 1-row result — the q_stats_histogram pattern)
    // broadcast back over the scores; bucket assignment is pure
    // map-side; the final rollup shuffles 3 rows. Scores are rounded
    // to 6dp BEFORE the quantile/cut so an interpolated boundary
    // landing exactly on a document compares identically in both
    // engines (the boundary IS derived from the same rounded values).
    Q("t_ppl_bucket", Some("""
      WITH n AS (SELECT doc_id,
               TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS s
             FROM documents),
      bg AS (SELECT doc_id, SUBSTR(s, i, 2) AS b
             FROM n, UNNEST(generate_series(1, LEN(s) - 1)) AS g(i)),
      lm AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b),
      tot AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM lm),
      sc AS (SELECT doc_id,
               ROUND(AVG(LN((lm.c + 1) / CAST(total + v AS DOUBLE))), 6) AS lp6
             FROM bg JOIN lm USING (b), tot
             GROUP BY doc_id),
      q AS (SELECT quantile_cont(lp6, 0.3333333333333333) AS q1,
                   quantile_cont(lp6, 0.6666666666666666) AS q2
            FROM sc)
      SELECT CASE WHEN lp6 >= q2 THEN 'head'
                  WHEN lp6 >= q1 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             ROUND(AVG(lp6), 4) AS avg_lp,
             ROUND(MIN(lp6), 4) AS min_lp,
             ROUND(MAX(lp6), 4) AS max_lp
      FROM sc, q
      GROUP BY 1
    """)) { t =>
      val sc = lmScores(t).select(col("doc_id"),
        round(col("lp_raw"), 6).as("lp6"))
      val q = sc.agg(
        expr("percentile(lp6, 0.3333333333333333)").as("q1"),
        expr("percentile(lp6, 0.6666666666666666)").as("q2"))
      sc.crossJoin(broadcast(q))
        .select(col("lp6"),
          when(col("lp6") >= col("q2"), "head")
            .when(col("lp6") >= col("q1"), "middle")
            .otherwise("tail").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          round(avg(col("lp6")), 4).as("avg_lp"),
          round(min(col("lp6")), 4).as("min_lp"),
          round(max(col("lp6")), 4).as("max_lp"))
    },

    // Corpus n-gram frequency table — the vocabulary/statistics
    // artifact every tokenizer build and contamination screen starts
    // from (top word bigrams corpus-wide). Map-side bigram explode →
    // ONE map-combined count shuffle (the bigram is the key, text
    // never moves) → global top-20 via TakeOrdered. At 100 TB the
    // count table is the artifact; the top-k cut is free.
    Q("t_ngram_freq", Some("""
      WITH w AS (
        SELECT doc_id, string_split(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(
                 LOWER(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')
               AS ws
        FROM documents),
      bg AS (
        SELECT ws[i] || ' ' || ws[i + 1] AS bigram
        FROM w, UNNEST(generate_series(1, LEN(ws) - 1)) AS g(i))
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM bg GROUP BY bigram
      ORDER BY n DESC, bigram LIMIT 20
    """)) { t =>
      val ws = split(TextFns.normalize(col("text")), " ")
      t.fan(t.documents)
        .select(col("doc_id"), ws.as("ws"))
        .select(explode(expr(
          "CASE WHEN size(ws) >= 2 THEN transform(" +
            "sequence(1, size(ws) - 1), " +
            "i -> concat(ws[i - 1], ' ', ws[i])) " +
            "ELSE array() END")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)
    },

    // Code-vs-prose detection — the curation gate for code-data
    // mixes (separate code from natural language before routing to
    // different cleaning/tokenization paths). Pure map-side signal
    // extraction: code-symbol density ({}();=<>), keyword hits, and
    // the combined flag. The corpus is synthetic prose, so every 7th
    // doc gets a deterministic code-like payload appended — both
    // branches of the detector really fire, and both engines build
    // the identical input.
    Q("t_code_detect", Some("""
      WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN
                 text || ' function f(x) { if (x > 0) { return x * 2; }'
                      || ' var y = []; } // end'
                 ELSE text END AS t2
        FROM documents)
      SELECT doc_id,
             CAST(LENGTH(t2) - LENGTH(REGEXP_REPLACE(t2, '[{}();=<>\[\]]', '', 'g')) AS INT) AS n_sym,
             ROUND((LENGTH(t2) - LENGTH(REGEXP_REPLACE(t2, '[{}();=<>\[\]]', '', 'g')))
                   / CAST(LENGTH(t2) AS DOUBLE), 6) AS sym_ratio,
             CAST(LEN(regexp_extract_all(t2, '\b(function|return|var|def|class|import)\b', 1)) AS INT) AS kw_hits,
             CAST(LEN(regexp_extract_all(t2, '\b(function|return|var|def|class|import)\b', 1)) >= 2
                  OR ROUND((LENGTH(t2) - LENGTH(REGEXP_REPLACE(t2, '[{}();=<>\[\]]', '', 'g')))
                     / CAST(LENGTH(t2) AS DOUBLE), 6) > 0.02 AS INT) AS is_code
      FROM d
    """)) { t =>
      val t2 = when(col("doc_id") % 7 === 0,
        concat(col("text"),
          lit(" function f(x) { if (x > 0) { return x * 2; }" +
            " var y = []; } // end")))
        .otherwise(col("text"))
      val symRe = "[{}();=<>\\[\\]]"
      // Doubled once for Scala, once more for the Spark SQL string
      // literal inside expr() — the SQL parser consumes one level.
      val kwRe = "\\\\b(function|return|var|def|class|import)\\\\b"
      t.documents.select(col("doc_id"), t2.as("t2"))
        .select(col("doc_id"),
          (length(col("t2")) - length(regexp_replace(col("t2"), symRe, "")))
            .cast("int").as("n_sym"),
          round((length(col("t2")) -
              length(regexp_replace(col("t2"), symRe, ""))) /
            length(col("t2")).cast("double"), 6).as("sym_ratio"),
          expr(s"size(regexp_extract_all(t2, '$kwRe', 1))").cast("int")
            .as("kw_hits"))
        .withColumn("is_code",
          (col("kw_hits") >= 2 || col("sym_ratio") > 0.02).cast("int"))
        .select("doc_id", "n_sym", "sym_ratio", "kw_hits", "is_code")
    },

    // Dataset card — the per-source summary table every training-mix
    // decision reads (docs, language spread, length distribution,
    // token budget, corpus share). One hash aggregation on `source`
    // with map-side partials; the exact median goes through the same
    // percentile/quantile_cont pair as q_agg_percentile; corpus-wide
    // totals are a 1-row broadcast. Shuffle carries |sources| rows —
    // SF-invariant.
    Q("t_dataset_card", Some("""
      WITH d AS (
        SELECT source, lang, n_chars,
               LEN(regexp_extract_all(text, '(\S+)', 1)) AS toks
        FROM documents),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d)
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             ROUND(AVG(n_chars), 4) AS avg_chars,
             ROUND(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
             CAST(SUM(toks) AS BIGINT) AS total_tokens,
             ROUND(AVG(CASE WHEN n_chars < 100 THEN 1.0 ELSE 0.0 END), 4)
               AS pct_short,
             ROUND(COUNT(*) / CAST(n_total AS DOUBLE), 6) AS corpus_share
      FROM d, tot
      GROUP BY source, n_total
    """)) { t =>
      val d = t.documents.select(col("source"), col("lang"), col("n_chars"),
        expr("text_stats(text)").getField("n_tokens").as("toks"))
      val tot = d.agg(count(lit(1)).as("n_total"))
      d.crossJoin(broadcast(tot))
        .groupBy("source", "n_total")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("lang").as("n_langs"),
          round(avg("n_chars"), 4).as("avg_chars"),
          round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
          sum("toks").as("total_tokens"),
          round(avg(when(col("n_chars") < 100, 1.0).otherwise(0.0)), 4)
            .as("pct_short"),
          round(count(lit(1)) / col("n_total").cast("double"), 6)
            .as("corpus_share"))
        .drop("n_total")
    },

    // BOILERPLATE detection (CCNet): a 10-word chunk that recurs in
    // ≥3 DISTINCT docs of the same source is boilerplate (nav bars,
    // footers, license headers — crawl text's biggest quality drag).
    // Same in-row chunking as d_dedup_lines; the shuffle key is
    // (source, 128-bit chunk hash) so chunk text never crosses an
    // exchange, df counts combine map-side, and the per-doc profile
    // is one more map-combined agg. Per doc: chunk count, boilerplate
    // chunks, ratio — the trim decision input.
    Q("t_boilerplate", Some("""
      WITH w AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws
                 FROM documents),
      c AS (SELECT doc_id, source,
              ARRAY_TO_STRING(ws[(i-1)*10+1:i*10], ' ') AS chunk
            FROM w, UNNEST(generate_series(1,
              CAST(CEIL(LEN(ws)/10.0) AS INT))) AS t(i)),
      df AS (SELECT source, chunk, COUNT(DISTINCT doc_id) AS nd
             FROM c GROUP BY source, chunk)
      SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(CASE WHEN df.nd >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler,
             ROUND(SUM(CASE WHEN df.nd >= 3 THEN 1.0 ELSE 0 END)
                   / COUNT(*), 4) AS boiler_ratio
      FROM c JOIN df ON df.source = c.source AND df.chunk = c.chunk
      GROUP BY c.doc_id
    """)) { t =>
      val ws = split(col("text"), " ")
      val chunkArr = when(size(ws) >= 1,
        transform(sequence(lit(1), ceil(size(ws) / 10.0).cast("int")),
          i => concat_ws(" ", slice(ws, (i - 1) * 10 + 1, lit(10)))))
        .otherwise(array().cast("array<string>"))
      val hashed = t.fan(t.documents)
        .select(col("doc_id"), col("source"), explode(chunkArr).as("chunk"))
        .select(col("doc_id"), col("source"),
          xxhash64(col("chunk")).as("h1"),
          xxhash64(lit(20260814L), col("chunk")).as("h2"))
      val df = hashed.groupBy("source", "h1", "h2")
        .agg(countDistinct(col("doc_id")).as("nd"))
      hashed.join(df, Seq("source", "h1", "h2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 3, 1L).otherwise(0L)).as("n_boiler"),
          round(sum(when(col("nd") >= 3, 1.0).otherwise(0.0)) /
            count(lit(1)), 4).as("boiler_ratio"))
    },

    // MARKUP STRIPPING — the html-to-text cleaning pass at the top of
    // every crawl pipeline. The corpus is plain text, so a
    // deterministic markup wrapper (every 3rd doc gains <p>/<b> tags
    // and an &amp; entity) makes both branches of the stripper fire
    // and keeps the entry oracle-exact; the strip chain itself —
    // tag regex removal, entity decode, whitespace collapse — is the
    // real operator and is pure map-side codegen'd regexp work, zero
    // shuffle at any corpus size.
    Q("t_html_clean", Some("""
      WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN '<p class="x"><b>intro</b>  ' || text
                         || ' &amp; <br/>tail</p>'
                    ELSE text END AS markup
        FROM documents)
      SELECT doc_id,
             TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
               markup, '<[^>]*>', '', 'g'), '&amp;', '&', 'g'),
               ' +', ' ', 'g')) AS clean,
             CAST(doc_id % 3 = 0 AS INT) AS had_markup
      FROM raw
    """)) { t =>
      val markup = when(col("doc_id") % 3 === 0,
        concat(lit("<p class=\"x\"><b>intro</b>  "), col("text"),
          lit(" &amp; <br/>tail</p>"))).otherwise(col("text"))
      t.documents
        .select(col("doc_id"), markup.as("markup"))
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(regexp_replace(
            col("markup"), "<[^>]*>", ""), "&amp;", "&"),
            " +", " ")).as("clean"),
          (col("doc_id") % 3 === 0).cast("int").as("had_markup"))
    },

    // READABILITY scoring (Flesch reading ease, vowel-group syllable
    // heuristic) — the classic text-difficulty signal filters add
    // next to quality/LM scores. Pure map-side: three regex counts
    // per doc folded into one codegen'd projection, no shuffle at
    // any corpus size. The score compares on ROUND(·,4) and both
    // engines run the identical [aeiouy]+ / [.!?]+ extractions.
    Q("t_readability", Some("""
      WITH f AS (
        SELECT doc_id,
               LEN(STRING_SPLIT(text, ' ')) AS words,
               GREATEST(LEN(regexp_extract_all(text, '[.!?]+')), 1)
                 AS sents,
               LEN(regexp_extract_all(LOWER(text), '[aeiouy]+')) AS syll
        FROM documents)
      SELECT doc_id, CAST(words AS BIGINT) AS words,
             CAST(sents AS BIGINT) AS sents,
             CAST(syll AS BIGINT) AS syll,
             ROUND(206.835 - 1.015 * (words / (1.0 * sents))
                   - 84.6 * (syll / (1.0 * words)), 4) AS flesch
      FROM f WHERE words >= 1
    """)) { t =>
      t.documents
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("words"),
          greatest(size(expr(
            "regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
            .cast("long").as("sents"),
          size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
            .cast("long").as("syll"))
        .filter(col("words") >= 1)
        .select(col("doc_id"), col("words"), col("sents"), col("syll"),
          round(lit(206.835)
            - lit(1.015) * (col("words") / (lit(1.0) * col("sents")))
            - lit(84.6) * (col("syll") / (lit(1.0) * col("words"))), 4)
            .as("flesch"))
    },

    // BPE MERGE TRAINING — the tokenizer-construction artifact (the
    // ranked merge table). Trains on the distinct-word vocabulary,
    // never the corpus (Bpe.trainMerges has the scale contract: one
    // corpus pass, then vocab-sized iterations with an O(1) driver
    // argmax per merge). The merge sequence is deterministic
    // (lexicographic tie-break), so the oracle unrolls the k rounds
    // as a materialized DuckDB CTE chain (Bpe.oracleChain — the
    // s_ann_mmr greedy-unroll precedent) and hash-checks the full
    // ranked table; the spec additionally pins the classic
    // low/lowest merge sequence and tie-break order.
    Q("t_bpe_train", Some(Bpe.trainOracle(k = 6))) { t =>
      val spark = t.spark
      import spark.implicits._
      Bpe.mergesFor(t, k = 6).toDF("step", "left", "right", "pair_n")
    },

    // BPE TOKENIZATION — apply the trained merge table and report
    // per-doc token counts + compression (chars per BPE token): the
    // number that prices a corpus in training FLOPs. Merges apply to
    // the DISTINCT-word vocabulary (map-side HOF chain), then one
    // join back to per-doc word counts — corpus text crosses one
    // word-count shuffle total. Oracle = the same unrolled merge
    // chain applied to the vocabulary in SQL, joined back to per-doc
    // word counts — token counts and compression are hash-checked
    // end to end; the spec additionally pins exact token counts on
    // the classic corpus.
    Q("t_bpe_apply", Some(Bpe.applyOracle(k = 6))) { t =>
      Bpe.tokenCounts(t.fan(t.documents), Bpe.mergesFor(t, k = 6))
    },

    // Deterministic TOKEN-DROPOUT augmentation — the word-dropout
    // recipe of small-data finetuning (augment by deleting ~10% of
    // tokens), with the pipeline requirement the stock random()
    // version can't meet: REPRODUCIBILITY. The coin is the shared
    // Knuth multiplicative hash on (doc_id·100003 + token_index), so
    // the augmented corpus is a pure function of the input — re-runs,
    // retries and the DuckDB oracle regenerate the identical text
    // (t_shuffle's determinism argument, applied per token). One
    // map-side indexed-HOF pass, zero exchanges; md5 of the rebuilt
    // text hash-checks the full augmented output without shipping it.
    // Spark lambda indexes are 0-based, DuckDB's 1-based — the +1
    // below aligns them.
    Q("t_augment", Some(s"""
      WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents),
      a AS (
        SELECT doc_id, ws,
               list_filter(
                 list_transform(ws, (x, i) -> {'w': x,
                   'c': ${TextFns.knuthCoinSql("(doc_id * 100003 + i)")}}),
                 s -> s.c >= 429496730) AS aug
        FROM w)
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(ws) - len(aug) AS BIGINT) AS n_dropped,
             MD5(array_to_string(list_transform(aug, s -> s.w), ' '))
               AS aug_fp
      FROM a
    """)) { t =>
      t.fan(t.documents)
        .withColumn("ws", expr("filter(split(text, ' '), x -> x <> '')"))
        .withColumn("aug", expr(s"""
          filter(
            transform(ws, (x, i) -> named_struct('w', x,
              'c', ${TextFns.knuthCoinSql("(doc_id * 100003 + i + 1)")})),
            s -> s.c >= 429496730)"""))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          (size(col("ws")) - size(col("aug"))).cast("long")
            .as("n_dropped"),
          md5(concat_ws(" ",
            expr("transform(aug, s -> s.w)")).cast("binary")).as("aug_fp"))
    },

    // BLOCKLIST safety filter — the deny-term screening pass every
    // production corpus runs before training (NSFW/PII-adjacent/
    // banned-source term lists; the fastText/blocklist stage of
    // CCNet-class pipelines). The blocklist rides a LITERAL in the
    // plan (a real deployment broadcasts a 10k-term list — same
    // shape): per doc, total whole-word hits, distinct blocked terms,
    // hit density per 1k words, and the keep decision at density
    // < 20/1k — flag-don't-drop, so downstream mixing can weight
    // instead of discard. Pure scan→project, zero exchanges at any
    // corpus size; both engines state the same token-equality count
    // (no regex-boundary ambiguity).
    Q("t_safety_filter", Some("""
      WITH w AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
      h AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(CASE WHEN w IN ('dup', 'error', 'spill')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               CAST(COUNT(DISTINCT CASE WHEN w IN ('dup', 'error', 'spill')
                        THEN w END) AS BIGINT) AS n_terms
        FROM w WHERE w <> '' GROUP BY doc_id)
      SELECT doc_id, n_words, n_hits, n_terms,
             ROUND(CAST(n_hits AS DOUBLE) * 1000 / n_words, 4)
               AS hits_per_1k,
             CAST(CAST(n_hits AS DOUBLE) * 1000 / n_words < 20 AS INT)
               AS keep
      FROM h
    """)) { t =>
      val blocked = Seq("dup", "error", "spill")
      val isBlocked = col("w").isin(blocked: _*)
      t.fan(t.documents)
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(when(isBlocked, 1).otherwise(0)).cast("long").as("n_hits"),
          countDistinct(when(isBlocked, col("w"))).as("n_terms"))
        .select(col("doc_id"), col("n_words"), col("n_hits"),
          col("n_terms"),
          round(col("n_hits").cast("double") * 1000 / col("n_words"), 4)
            .as("hits_per_1k"),
          (col("n_hits").cast("double") * 1000 / col("n_words") < 20)
            .cast("int").as("keep"))
    },

    // Lexical-entropy quality signals (CCNet/Gopher-class filters:
    // low word entropy = repetitive/boilerplate, low char entropy =
    // degenerate byte soup, low TTR = template text). The engine
    // computes all four numbers in ONE map-side pass per document
    // (functions/EntropyStats.scala — token + byte histograms in-row,
    // H = log2 n − Σ c·log2 c / n over exact integer counts), so at
    // 100 TB the signal costs a scan with zero exchanges; the oracle
    // derives the same numbers the expensive declarative way —
    // explode words/chars, DuckDB's own base-2 entropy() aggregate —
    // proving the kernel against an independent formulation. 4dp
    // rounding fences libm log2 ulp drift; token-less docs drop on
    // both sides (oracle's join, engine's n_tokens > 0).
    Q("t_entropy", Some("""
      WITH w AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS w
        FROM documents),
      we AS (
        SELECT doc_id, round(entropy(w), 4) AS word_entropy,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types,
               CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM w WHERE w <> '' GROUP BY doc_id),
      c AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '')) AS ch
        FROM documents),
      ce AS (
        SELECT doc_id, round(entropy(ch), 4) AS char_entropy
        FROM c GROUP BY doc_id)
      SELECT we.doc_id AS doc_id, n_tokens, n_types,
             round(CAST(n_types AS DOUBLE) / n_tokens, 4) AS ttr,
             word_entropy, char_entropy
      FROM we JOIN ce ON we.doc_id = ce.doc_id
    """)) { t =>
      // Token-less docs drop via a has-any-token-char regex — the
      // same predicate as n_tokens > 0, but evaluated WITHOUT the
      // kernel (a filter on the struct field would re-run the whole
      // histogram pass per row when Catalyst pushes it below the
      // project). The character class is spelled out rather than \S
      // because Java \s includes \x0B (vertical tab) while the
      // kernel's RE2-pinned token class treats \x0B as a token char —
      // a \S filter would drop a vertical-tab-only doc the oracle
      // keeps.
      t.fan(t.documents.filter(col("text").rlike("[^ \\t\\n\\f\\r]")))
        .select(col("doc_id"),
          call_function("graft_entropy_stats", col("text")).as("s"))
        .select(col("doc_id"),
          col("s.n_tokens").cast("bigint").as("n_tokens"),
          col("s.n_types").cast("bigint").as("n_types"),
          round(col("s.n_types").cast("double") / col("s.n_tokens"), 4)
            .as("ttr"),
          round(col("s.word_entropy"), 4).as("word_entropy"),
          round(col("s.char_entropy"), 4).as("char_entropy"))
    },
  )
}
