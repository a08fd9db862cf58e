package graft.ann

import graft.Tables
import graft.functions.VectorFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-principal-component scoring over the embedding corpus.
  *
  * The covariance never materializes per-vector outer products into a
  * shuffle wider than the matrix itself: each row's upper-triangle
  * products are built IN-ROW by a nested-HOF expression and go
  * straight into a map-side-combined groupBy on (i, j) — the exchange
  * carries at most d(d+1)/2 = 2080 cells per map task regardless of
  * corpus size, the same cells trick as the centroid analytics. The
  * d×d matrix is O(1) driver data; power iteration on it is driver
  * arithmetic like the graph loops' convergence scalars, and the
  * projection is one broadcast-literal map-side pass.
  */
object Pca {

  /** (mean, pc1) of the corpus's d-dim vectors by 50 power-iteration
    * steps on the driver-side covariance; pc1's sign is fixed by its
    * first component of magnitude > 1e-12. */
  def principal(vecsDf: DataFrame, d: Int): (Array[Double], Array[Double]) = {
    // One pass: per-dim first moments and upper-triangle second
    // moments, keyed (i, j) with j = i for the means row.
    val cells = vecsDf
      .select(explode(expr(
        s"""flatten(transform(v, (x, i) ->
              transform(slice(v, i + 1, $d - i), (y, k) ->
                struct(i AS i, i + k AS j, x * y AS p, x AS x))))"""))
        .as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).as("s2"),
        sum(when(col("c.i") === col("c.j"), col("c.x"))).as("s1"),
        count(when(col("c.i") === col("c.j"), lit(1))).as("n"))
      .collect()
    val s2 = Array.ofDim[Double](d, d)
    val s1 = new Array[Double](d)
    var n = 0L
    cells.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      s2(i)(j) = r.getDouble(2); s2(j)(i) = r.getDouble(2)
      if (i == j) { s1(i) = r.getDouble(3); n = r.getLong(4) }
    }
    val mean = s1.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      s2(i)(j) / n - mean(i) * mean(j))
    var w = Array.fill(d)(1.0 / math.sqrt(d))
    for (_ <- 1 to 50) {
      val cw = cov.map(row => row.zip(w).map { case (a, b) => a * b }.sum)
      val nrm = math.sqrt(cw.map(x => x * x).sum)
      w = cw.map(_ / nrm)
    }
    val lead = w.find(math.abs(_) > 1e-12).getOrElse(1.0)
    if (lead < 0) w = w.map(-_)
    (mean, w)
  }

  /** Per-vector score along pc1 (centered projection), one map-side
    * pass with the mean/pc1 vectors inlined as array literals. */
  def scores(t: Tables): DataFrame = {
    val corpus = t.fan(t.embeddings)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (mean, pc1) = principal(corpus, d = 64)
    val pcCol = array(pc1.map(lit): _*)
    val offset = mean.zip(pc1).map { case (m, p) => m * p }.sum
    corpus.select(col("vec_id"),
      round(dot(col("v"), pcCol) - lit(offset), 4).as("pc1_score"))
  }
}
