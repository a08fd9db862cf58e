package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** The single-pass shingle-hash kernels must be bit-identical to the
  * declarative formulations they replace (substring/concat_ws +
  * xxhash64), since MinHash/Jaccard signatures are built on them.
  */
class ShingleHashSpec extends SparkSpecBase {

  private lazy val docs = t.documents.limit(200)

  test("char shingle hashes equal xxhash64 over substrings") {
    val both = docs
      .withColumn("sh", TextFns.charShingles(col("text"), 5))
      .select(col("doc_id"),
        expr("transform(sh, s -> xxhash64(s))").as("ref"),
        TextFns.charShingleHashes(col("text"), 5).as("fast"))
    assert(both.filter(col("ref") =!= col("fast")).count() == 0)
    assert(both.filter(size(col("fast")) > 0).count() > 0)
  }

  test("word shingle hashes equal xxhash64 over concat_ws shingles") {
    val both = docs
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("sh", TextFns.wordShingles(col("toks"), 3))
      .select(col("doc_id"),
        expr("transform(sh, s -> xxhash64(s))").as("ref"),
        TextFns.wordShingleHashes(col("text"), 3).as("fast"))
    assert(both.filter(col("ref") =!= col("fast")).count() == 0)
    assert(both.filter(size(col("fast")) > 0).count() > 0)
  }

  test("kernels handle edge cases: short, empty, unicode, 1-gram") {
    import spark.implicits._
    val cases = Seq("", "ab", "abcd", "abcde", "héllo wörld again",
      " padded   text ", "one", "a b", "日本語 テスト 漢字 かな")
      .toDF("text")
    val charBoth = cases
      .withColumn("sh", TextFns.charShingles(col("text"), 5))
      .select(expr("transform(sh, s -> xxhash64(s))").as("ref"),
        TextFns.charShingleHashes(col("text"), 5).as("fast"))
    charBoth.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    val wordBoth = cases
      .withColumn("toks", TextFns.tokens(col("text")))
      .select(
        expr("transform(toks, s -> xxhash64(s))").as("ref"),
        TextFns.wordShingleHashes(col("text"), 1).as("fast"))
    wordBoth.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
