package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: multi-column min-max pruning beats the
  * single-column clustered layout for 2-D predicate boxes. */
class ZOrderSpec extends SparkSpecBase {

  test("zvalue interleaves bits (known points)") {
    val df = spark.range(1).select(
      ZOrder.zvalue(lit(0), lit(0)).as("z00"),
      ZOrder.zvalue(lit(1), lit(0)).as("z10"),
      ZOrder.zvalue(lit(0), lit(1)).as("z01"),
      ZOrder.zvalue(lit(3), lit(5)).as("z35"))
    val r = df.head()
    assert(r.getAs[Long]("z00") == 0L)
    assert(r.getAs[Long]("z10") == 1L)
    assert(r.getAs[Long]("z01") == 2L)
    // a=3 (011), b=5 (101): bits interleave to b2 a2 b1 a1 b0 a0 =
    // 1 0 0 1 1 1 = 39.
    assert(r.getAs[Long]("z35") == 39L)
  }

  test("z-ordered layout touches fewer files than partkey-sorted for a 2-D box") {
    val li = t.lineitem.select("l_orderkey", "l_partkey", "l_quantity")
    val nFiles = 64
    val zDir = "/tmp/graft_zorder/li_z"
    val pDir = "/tmp/graft_zorder/li_p"
    // Z-order on (partkey, orderkey); the comparison layout is the
    // classic single-column clustered sort on partkey.
    ZOrder.write(li,
      ZOrder.bucketed(col("l_partkey"), 199),
      ZOrder.bucketed(col("l_orderkey"), 1500),
      zDir, nFiles)
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(pDir)
    val z = spark.read.parquet(zDir)
    val p = spark.read.parquet(pDir)
    // A moderate 2-D box: ~25% of each dimension. The partkey-sorted
    // layout can only prune on partkey (~25% of files survive); the
    // z-layout's files cover 2-D rectangles, so both predicates
    // prune.
    val zTouched = ZOrder.filesTouched(z, "l_partkey", "l_orderkey",
      50, 99, 0, 375)
    val pTouched = ZOrder.filesTouched(p, "l_partkey", "l_orderkey",
      50, 99, 0, 375)
    assert(zTouched < pTouched,
      s"z-order touched $zTouched files vs $pTouched for the sorted layout")
    // And both layouts return identical data for the box.
    def boxCount(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("l_partkey").between(50, 99) &&
        col("l_orderkey").between(0, 375)).count()
    assert(boxCount(z) == boxCount(p) && boxCount(z) > 0)
  }
}
