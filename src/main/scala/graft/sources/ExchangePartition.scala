package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** ALTER TABLE ... EXCHANGE PARTITION (reference: ddl/partition.go +
  * executor DDL path — swap a partition's data with a standalone
  * staging table ATOMICALLY, both directions: the staged data becomes
  * the partition, the old partition becomes the staging table). The
  * warehouse pattern this serves at 100 TB: backfill/correct one
  * partition by writing a staging table on the side, validate it,
  * then publish with O(1) metadata renames — the fact is never
  * rewritten and readers never see a half-written partition
  * directory.
  *
  * Validation (TiDB validates exchanged rows satisfy the partition
  * definition; WITHOUT VALIDATION skips): dir-layout parquet written
  * via partitionBy does not store the partition column in the files,
  * so the enforceable check here is SCHEMA equality between the
  * staged table and the current partition (name+type, order-
  * insensitive), plus an optional row predicate over the staged
  * columns for layouts that do store them. Schema check always runs;
  * a mismatch refuses the swap before anything moves. */
object ExchangePartition {

  /** Swap `base/<partSpec>` with the table at `stageDir`.
    * `partSpec` is the literal partition dir name (e.g. "yr=1994").
    * Returns (rows moved in, rows moved out) — both sides counted
    * BEFORE the swap for the caller's audit log. */
  def exchange(spark: SparkSession, base: String, partSpec: String,
      stageDir: String, validatePredicate: Option[String] = None): (Long, Long) = {
    val partDir = s"$base/$partSpec"
    require(new File(partDir).isDirectory, s"no partition at $partDir")
    require(new File(stageDir).isDirectory, s"no staging table at $stageDir")
    val part = spark.read.parquet(partDir)
    val staged = spark.read.parquet(stageDir)
    val partSchema = part.schema.fields.map(f => (f.name, f.dataType))
      .sortBy(_._1).toSeq
    val stageSchema = staged.schema.fields.map(f => (f.name, f.dataType))
      .sortBy(_._1).toSeq
    if (partSchema != stageSchema) throw new IllegalStateException(
      s"exchange refused: staged schema $stageSchema does not match " +
        s"partition schema $partSchema")
    validatePredicate.foreach { p =>
      val bad = staged.filter(s"NOT ($p)").count()
      if (bad > 0) throw new IllegalStateException(
        s"exchange refused: $bad staged rows violate partition " +
          s"definition ($p)")
    }
    val in = staged.count()
    val out = part.count()
    // Three renames publish the swap; a crash between them leaves
    // complete directories (never partial files), and the tmp name is
    // dotted so a concurrent reader of `base` ignores it.
    val tmp = Paths.get(base, s".exchange_tmp_${System.nanoTime()}")
    Files.move(Paths.get(partDir), tmp, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(stageDir), Paths.get(partDir),
      StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, Paths.get(stageDir), StandardCopyOption.ATOMIC_MOVE)
    (in, out)
  }
}
