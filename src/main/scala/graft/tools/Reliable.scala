package graft.tools

import org.apache.spark.sql.DataFrame

/** Lineage truncation with a cluster-survivable option — ONE spelling
  * of the graph loops' `cp()` discipline, shared by every layout that
  * materializes derived state (graph iteration rounds, the streaming
  * ingest sinks' novel sets, the IVF build's centroid rounds).
  *
  * `localCheckpoint()` keeps blocks in executor memory — the right
  * local[32] call, but on a cluster a lost executor drops blocks and
  * the WHOLE derivation recomputes from the source scan (lineage is
  * truncated, so there is nothing to replay from). Setting
  * `spark.graft.graph.checkpointDir` (an HDFS/S3 path on a real
  * cluster) switches every caller to a RELIABLE checkpoint: the
  * state is written to that storage once and re-read, so block loss
  * re-reads files instead of re-running the derivation. The parquet
  * round-trip is deliberate (not Dataset.checkpoint, whose
  * unpersisted RDD checkpoint recomputes the plan a second time for
  * the checkpoint job). Files are session-scoped artifacts under the
  * configured dir — the caller deletes the dir after the job, like
  * any Spark checkpoint location.
  */
object Reliable {
  /** JVM-unique sequence for reliable-checkpoint paths — two loops
    * (or loop rounds) must never write the same cp dir. */
  private val cpSeq = new java.util.concurrent.atomic.AtomicLong

  def cp(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    ss.conf.getOption("spark.graft.graph.checkpointDir") match {
      case Some(dir) if dir.nonEmpty =>
        val p = s"${dir.stripSuffix("/")}/cp-${cpSeq.incrementAndGet()}"
        df.write.mode("overwrite").parquet(p)
        ss.read.parquet(p)
      case _ => df.localCheckpoint()
    }
  }
}
