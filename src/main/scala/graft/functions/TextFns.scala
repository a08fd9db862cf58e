package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * suites. Everything is built from codegen'd builtins + higher-order
  * functions — no UDFs, so the operators scale as pure map-side work.
  */
object TextFns {

  /** Non-whitespace tokens. */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("(\\S+)"), lit(1))

  /** Deterministic per-row coin in [0, 2^32): Knuth's multiplicative
    * hash of an integral key. Pure integer arithmetic, so any SQL
    * engine reproduces the exact value — the sampling/shuffle
    * primitive behind d_mix_sample and t_shuffle (their oracles
    * inline the same expression).
    *
    * The multiply runs as a 16/16-bit split so no intermediate
    * exceeds 2^49: a naive `key * 2654435761` silently wraps Long
    * for keys above ~3.47e9 (negative coin → rows never sampled)
    * while DuckDB raises a BIGINT-overflow error — a latent
    * engine/oracle divergence at 100 TB id ranges. The split form
    * equals `((key & 0xFFFFFFFF) * M) mod 2^32` exactly for every
    * non-negative key, and matches the old formula wherever the old
    * formula did not overflow (keys up to ~3.47e9) — in the narrow
    * band (3.47e9, 2^32) the old form was already wrong (negative),
    * so samples drawn there were never reproducible to begin with. */
  def knuthCoin(key: Column): Column = {
    val m = 2654435761L
    val hi = shiftright(key, 16).bitwiseAND(lit(65535L)) * m % 4294967296L
    val lo = key.bitwiseAND(lit(65535L)) * m
    (hi * 65536L + lo) % 4294967296L
  }

  /** The DuckDB rendering of [[knuthCoin]] — inlined by the
    * d_mix_sample / t_shuffle oracles so both engines evaluate the
    * bit-identical arithmetic. */
  def knuthCoinSql(key: String): String =
    s"((((($key >> 16) & 65535) * 2654435761) % 4294967296) * 65536 + " +
      s"(($key & 65535) * 2654435761)) % 4294967296"

  /** Lowercased, punctuation-stripped, whitespace-collapsed text. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Character n-gram shingles (guarded for short docs). */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(expr(
        s"transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n))"))

  /** Word n-gram shingles over a token array column named `toks`. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(expr(
        s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))

  /** xxhash64 of every char n-gram, via the single-pass kernel —
    * bit-identical to `transform(charShingles(t, n), xxhash64)`. */
  def charShingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      CharShingleHashes(org.apache.spark.sql.GraftSqlShim.expr(text), n))

  /** xxhash64 of every word n-gram (single-space joined) — bit-
    * identical to `transform(wordShingles(tokens(t), n), xxhash64)`;
    * n=1 is per-token hashing. */
  def wordShingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      WordShingleHashes(org.apache.spark.sql.GraftSqlShim.expr(text), n))

  /** Fused k-permutation MinHash signature over char n-grams —
    * running minima kept inside one kernel pass, so signature
    * building is pure map work with no exploded rows (empty array
    * for sub-n texts). */
  def minhashSignature(text: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      MinHashSignature(org.apache.spark.sql.GraftSqlShim.expr(text), n, k))
}
