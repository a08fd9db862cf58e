package graft

import graft.sources.ShardWriter
import org.apache.spark.sql.functions._

/** The shard writer must produce capped, deterministic, lossless
  * shards from the cleaned-corpus pipeline output.
  */
class ShardWriterSpec extends SparkSpecBase {

  private val dir = "/tmp/graft_shards"

  private lazy val cleaned =
    Registry.all.find(_.name == "t_pipeline").get.run(t)

  test("shards are lossless and capped at shardRows records") {
    ShardWriter.write(cleaned, "doc_id", dir, shardRows = 50, nShards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == cleaned.count())
    assert(back.select("doc_id").distinct().count() == cleaned.count())
    val perFile = back.groupBy(input_file_name()).count().collect()
    assert(perFile.nonEmpty)
    perFile.foreach(r => assert(r.getLong(1) <= 50,
      s"shard over cap: ${r.getLong(1)} rows in ${r.getString(0)}"))
  }

  test("shard layout is deterministic across writes") {
    ShardWriter.write(cleaned, "doc_id", dir + "_a", 50, 4)
    ShardWriter.write(cleaned, "doc_id", dir + "_b", 50, 4)
    def sig(d: String) = spark.read.parquet(d)
      .withColumn("f",
        regexp_extract(input_file_name(), "part-(\\d+)", 1).cast("int"))
      .groupBy("f").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toMap
    assert(sig(dir + "_a") == sig(dir + "_b"))
  }
}
