package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  * Arithmetic happens in DOUBLE with sequential fold order, so
  * results are deterministic and oracle-comparable after rounding.
  *
  * `dot` rides the native codegen'd [[DotProduct]] expression
  * (registered per session by [[GraftFunctions.register]]); `dotHof`
  * is the builtin higher-order-function formulation kept as a
  * reference/cross-check implementation.
  */
object VectorFns {

  def toDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine from precomputed norms: identical arithmetic to
    * [[cosine]] — norm(x) = sqrt(dot(x, x)) evaluated once per VECTOR
    * (a projection column) instead of once per PAIR — so scores are
    * bit-identical and oracle hashes unchanged, but an all-pairs
    * scoring pass runs 1 dot product per pair instead of 3. At 100 TB
    * the pair side dwarfs the vector side by orders of magnitude. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Shared exact-cosine re-rank over candidate pairs carrying
    * (qid, qv, nq) × (vec_id, v, nv): score with precomputed-norm
    * cosine, keep top-k per query on the deterministic
    * (round(c, 8) desc, vec_id) key, emit (qid, vec_id, [carry...],
    * cos@4dp). Every ANN entry (brute / LSH / IVF in-query / IVF
    * probe / BQ) ends in this block — one definition, so a
    * ranking-key tweak cannot silently diverge between them. `dedup`
    * inserts the distinct that multi-bucket candidate generators
    * (LSH tables, IVF probes) need; generators that already emit
    * unique pairs skip its shuffle. `carry` threads extra per-pair
    * columns (e.g. BQ's hamming distance) through to the output
    * unchanged. */
  def rerankTopK(pairs: DataFrame, topk: Int,
      dedup: Boolean, carry: Seq[String] = Nil): DataFrame = {
    // dedup keeps an ARBITRARY row among duplicate (qid, vec_id)
    // pairs: combined with carry columns whose values can differ per
    // candidate route (e.g. a per-probe distance) the emitted carry
    // value would be nondeterministic — refuse the combination until
    // a caller defines which row wins.
    require(carry.isEmpty || !dedup,
      "rerankTopK: dedup=true with carry columns is nondeterministic " +
        "(dropDuplicates keeps an arbitrary row per pair)")
    val w = Window.partitionBy("qid")
      .orderBy(round(col("c"), 8).desc, col("vec_id"))
    val scored = pairs
      .filter(col("vec_id") =!= col("qid"))
      .select(Seq(col("qid"), col("vec_id")) ++ carry.map(col) :+
        cosinePre(col("qv"), col("v"), col("nq"), col("nv")).as("c"): _*)
    // dropDuplicates on the PAIR key only: a distinct() over carry
    // columns too would let duplicate (qid, vec_id) pairs with
    // differing carry values occupy multiple top-k slots.
    (if (dedup) scored.dropDuplicates(Seq("qid", "vec_id")) else scored)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topk)
      .select(Seq(col("qid"), col("vec_id")) ++ carry.map(col) :+
        round(col("c"), 4).as("cos"): _*)
  }

  /** [[rerankTopK]] re-expressed through the map-side-combining
    * [[TopKByRank]] aggregate — IDENTICAL output (same scoring, same
    * rank-desc/vec_id-asc key, same 4dp rounding; equality is
    * spec-pinned), different exchange: the window form shuffles every
    * candidate pair to rank it, this form exchanges only k rows per
    * (group, partition). Use it when the candidate set is the large
    * side of the plan (corpus-as-queries kNN graphs); the window form
    * stays for the small bounded-pool entries and for `dedup`/`carry`
    * callers. */
  def rerankTopKAgg(pairs: DataFrame, topk: Int): DataFrame = {
    pairs.filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosinePre(col("qv"), col("v"), col("nq"), col("nv")).as("c"))
      .groupBy("qid")
      .agg(TopKByRank.col(round(col("c"), 8), col("vec_id"), col("c"),
        topk).as("tk"))
      .select(col("qid"), explode(col("tk")).as("e"))
      .select(col("qid"), col("e.id").as("vec_id"),
        round(col("e.payload"), 4).as("cos"))
  }
}
