package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard writer: the terminal stage of an LLM data pipeline.
  *
  * Takes a cleaned/deduped document set and lays it out as
  * fixed-size parquet shards, deterministically: rows are spread by
  * a hash of the id column (`repartitionByRange` over `xxhash64(id)`
  * gives stable, evenly-filled, order-independent shards) and each
  * file is capped with `maxRecordsPerFile`, so a 100 TB corpus lands
  * as uniformly-sized shards regardless of upstream partitioning or
  * skew — the property loaders care about (one shard ≈ one training
  * chunk, no giant stragglers).
  */
object ShardWriter {

  def write(docs: DataFrame, idCol: String, dir: String,
      shardRows: Int, nShards: Int): Unit =
    docs
      .withColumn("__shard_key", xxhash64(col(idCol)))
      .repartitionByRange(nShards, col("__shard_key"))
      .drop("__shard_key")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", shardRows)
      .parquet(dir)

  /** Streaming shard export: the continuous version of the terminal
    * pipeline stage — a cleaned document STREAM lands as training
    * shards as it arrives. Each micro-batch is written with the same
    * deterministic layout into its own `batch=<id>` directory, and
    * because the directory name is the batch id and the write is an
    * overwrite, a batch replayed after a failure rewrites the SAME
    * directory instead of appending duplicates — idempotent sink +
    * checkpointed offsets = effectively-once shard export. Readers
    * consume `dir/batch=*` as one partitioned dataset. */
  def startStream(docs: DataFrame, idCol: String, dir: String,
      shardRows: Int, nShards: Int, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        write(batch, idCol, s"$dir/batch=$batchId", shardRows, nShards)
      }
      .start()
}
