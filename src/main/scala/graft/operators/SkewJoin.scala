package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join for hot keys, complementing AQE's runtime
  * skew-split (spark.sql.adaptive.skewJoin): when one join key holds
  * a disproportionate share of the left (fact) side, a plain shuffle
  * sends the whole hot key to one reducer. Salting splits it
  * deterministically: the fact side spreads each key over `buckets`
  * sub-partitions via a hash of a per-row tiebreak column; the
  * (smaller) build side is replicated once per bucket. Result set is
  * identical to the unsalted join — only the partitioning changes.
  *
  * The reference handles the same problem with region-split hot
  * ranges (tidb store/ split on hot keys); salting is the shuffle-
  * engine equivalent.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTiebreak: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(leftTiebreak)), lit(buckets)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
