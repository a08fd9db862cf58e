package graft.ann

import graft.functions.VectorFns.dot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization — the vector-COMPRESSION leg of the ANN
  * family (IVF partitions the corpus; PQ shrinks the bytes). The
  * D-dim vector is split into M subspaces of S dims; each subspace
  * gets its own K-centroid codebook (deterministic k-means, same
  * conventions as [[IvfIndex]]: first-K seeds, bounded Lloyd rounds,
  * centroids rounded to 6dp so float summation order cannot flip an
  * assignment); a vector is stored as M small codes. At K=16 a 64-dim
  * float vector compresses 64× (256 bytes → 8 nibbles) — the
  * difference between an embedding corpus that fits executor memory
  * and one that doesn't.
  *
  * Queries score against codes with the ADC (asymmetric distance
  * computation) trick: one M×K lookup table of exact
  * query-sub×centroid dot products per query, then every corpus
  * vector's approximate dot is a sum of M table lookups — no float
  * vector is ever read at scan time.
  *
  * Scale: codebooks are tiny (M·K rows) and broadcast everywhere;
  * training shuffles (vec_id, m) sub-vector rows with map-side
  * partial means; encoding is one broadcast-join map pass over the
  * corpus. All k-means caveats from IvfIndex apply (empty cells may
  * drop, which only ever coarsens the quantizer).
  */
object PqIndex {

  /** Sub-vector view of the corpus: (vec_id, m, sv, nsv2). */
  private def subvectors(corpus: DataFrame, m: Int, s: Int): DataFrame =
    corpus.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${m - 1}), j -> struct(j AS m, slice(v, j * $s + 1, $s) AS sv))"))
        .as("x"))
      .select(col("vec_id"), col("x.m").as("m"), col("x.sv").as("sv"))
      .withColumn("nsv2", dot(col("sv"), col("sv")))

  /** Nearest-centroid assignment per (vec_id, m): L2 via the
    * precomputed-norm identity |a-c|² = |a|² + |c|² - 2a·c (one dot
    * per pair); argmin through a struct MIN so ties break on cid
    * deterministically.
    *
    * MAP-SIDE: each subspace's whole K-row codebook is packed into
    * ONE broadcast array row, and the argmin is array_min over a
    * transform — same arithmetic, same (dist, cid) tie-break as the
    * old explode-pairs + groupBy formulation, but with no K× row
    * blowup and NO shuffle per Lloyd round (the groupBy argmin was
    * the training loop's dominant exchange). */
  private def assign(subv: DataFrame, cent: DataFrame): DataFrame = {
    val packs = cent.groupBy("m").agg(
      collect_list(struct(col("cid"), col("c"), col("nc2"))).as("cents"))
    subv.join(broadcast(packs), "m")
      .withColumn("mn", array_min(transform(col("cents"), cn =>
        struct((col("nsv2") + cn("nc2") - lit(2.0) * dot(col("sv"), cn("c")))
          .as("dist"), cn("cid").as("cid")))))
      .select(col("vec_id"), col("m"), col("mn.cid").as("cid"), col("sv"))
  }

  /** Per-(m, cid) mean of member sub-vectors, rounded to 6dp — one
    * groupBy carrying `s` per-dimension AVG aggregates (the
    * posexplode + per-dim groupBy + re-collect formulation paid a
    * second shuffle per Lloyd round for the same arithmetic). */
  private def recompute(assigned: DataFrame, s: Int): DataFrame =
    assigned.groupBy("m", "cid")
      .agg(array((1 to s).map(j =>
        round(avg(element_at(col("sv"), j)), 6)): _*).as("c"))
      .withColumn("nc2", dot(col("c"), col("c")))

  /** Train M codebooks and encode the corpus.
    * @return (codes: (vec_id, m, cid), codebooks: (m, cid, c, nc2)) */
  def build(corpus: DataFrame, m: Int, s: Int, k: Int,
      iters: Int): (DataFrame, DataFrame) = {
    val subv = subvectors(corpus, m, s).localCheckpoint()
    var cent = subv.filter(col("vec_id") < k)
      .select(col("m"), col("vec_id").as("cid"),
        expr("transform(sv, x -> round(x, 6))").as("c"))
      .withColumn("nc2", dot(col("c"), col("c")))
      .localCheckpoint()
    for (_ <- 1 to iters)
      cent = recompute(assign(subv, cent), s).localCheckpoint()
    (assign(subv, cent).select("vec_id", "m", "cid"), cent)
  }

  /** ADC lookup table for a query set: exact dot of each query
    * sub-vector against each centroid, rounded to 6dp so the M-term
    * score sum is order-independent across runs. */
  def adcLut(queries: DataFrame, cent: DataFrame, s: Int): DataFrame =
    queries.crossJoin(broadcast(cent))
      .select(col("qid"), col("m"), col("cid"),
        round(dot(slice(col("qv"), col("m") * s + 1, lit(s)), col("c")), 6)
          .as("d"))

  /** ADC candidate generation, shared by the in-query build
    * (s_ann_pq), the persisted-index probe (s_ann_pq_probe) and the
    * composed IVF×PQ entry (s_ann_ivfpq) so the scoring/ranking key
    * cannot silently diverge: approximate dot = sum of the M per-code
    * table lookups, top-`topn` per query on the deterministic
    * (round(adc, 6) desc, vec_id) key.
    *
    * `cellConst`, when given, is the IVFPQ probe table — one
    * (qid, cell, qc) row per (query, probed cell) with qc = the exact
    * dot(q, centroid) term of the decomposition dot(q, v) =
    * dot(q, c(v)) + dot(q, v−c(v)). `codes` must then carry a `cell`
    * column; the join doubles as the cell restriction (non-probed
    * cells never pair), and the score becomes qc + Σ lookups (a
    * vector lives in exactly one cell, so min(qc) is that constant). */
  def adcCandidates(codes: DataFrame, cent: DataFrame, queries: DataFrame,
      s: Int, topn: Int, cellConst: Option[DataFrame] = None): DataFrame = {
    val lut = adcLut(queries.select("qid", "qv"), cent, s)
    val scored = cellConst match {
      case Some(probes) =>
        codes.join(broadcast(probes), "cell")
          .join(broadcast(lut), Seq("qid", "m", "cid"))
          .groupBy("qid", "vec_id")
          .agg((min(col("qc")) + sum(col("d"))).as("adc"))
      case None =>
        codes.join(broadcast(lut), Seq("m", "cid"))
          .groupBy("qid", "vec_id").agg(sum(col("d")).as("adc"))
    }
    scored
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(round(col("adc"), 6).desc, col("vec_id"))))
      .filter(col("rn") <= topn)
      .select("qid", "vec_id")
  }

  /** Persist codes + codebooks as the serving index: the corpus
    * representation on disk is M codes per vector (64× smaller than
    * the float vectors) plus the tiny codebook table. */
  def writeIndex(corpus: DataFrame, dir: String, m: Int, s: Int, k: Int,
      iters: Int): Unit = {
    val (codes, cent) = build(corpus, m, s, k, iters)
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    cent.write.mode("overwrite").parquet(s"$dir/codebooks")
  }
}
