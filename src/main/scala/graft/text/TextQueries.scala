package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis suite for LLM data pipelines: language-ID, quality
  * scoring, token counting. Pure map-side column work — embarrassingly
  * parallel at any scale, no shuffle at all (the plans are scan →
  * project). Oracles reproduce every heuristic in DuckDB SQL.
  */
object TextQueries {

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
  )
}
