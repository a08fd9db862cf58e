package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._

/** The native codegen'd DotProduct expression must agree bit-for-bit
  * with the higher-order-function reference implementation (same
  * sequential double fold), from both the Column API and SQL.
  */
class DotProductSpec extends SparkSpecBase {

  private lazy val vecs = t.embeddings
    .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))

  test("codegen dot product equals the HOF reference, bit-for-bit") {
    val rows = vecs.limit(50)
      .select(VectorFns.dot(col("v"), col("v")).as("native"),
        VectorFns.dotHof(col("v"), col("v")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("GraftExtensions installs graft_dot from session config alone") {
    // The shared session is built with spark.sql.extensions =
    // graft.plans.GraftExtensions; the function must resolve in SQL
    // with no library-side registration call.
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(v == 11.0)
  }

  test("graft_dot is callable from SQL and casts float arrays") {
    t.embeddings.createOrReplaceTempView("emb")
    val n = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM emb LIMIT 5")
      .collect()
    assert(n.length == 5 && n.forall(_.getDouble(0) > 0))
  }

  test("norms are positive and cosine self-similarity is 1") {
    val rows = vecs.limit(20)
      .select(VectorFns.cosine(col("v"), col("v")).as("c")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }
}
