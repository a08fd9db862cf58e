package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** ALTER TABLE ... EXCHANGE PARTITION (reference: ddl/partition.go +
  * executor DDL path — swap a partition's data with a standalone
  * staging table, both directions: the staged data becomes the
  * partition, the old partition becomes the staging table). The
  * guarantee here is NO PARTIAL DIRECTORIES — each of the three
  * publishing renames is atomic — not a single atomic two-way swap:
  * a concurrent reader can see the partition briefly absent between
  * renames 1 and 2, and a rename-3 failure leaves the displaced
  * partition in a dotted tmp dir (surfaced in the error for manual
  * recovery; the published fact itself is already consistent). The
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
      // NULL counts as a violation: NOT(NULL) is NULL and would slip
      // through a bare NOT filter, but a row whose partition
      // expression is NULL does not satisfy the partition definition
      // (TiDB's exchange validation rejects it too).
      val bad = staged.filter(s"($p) IS NULL OR NOT ($p)").count()
      if (bad > 0) throw new IllegalStateException(
        s"exchange refused: $bad staged rows violate partition " +
          s"definition ($p)")
    }
    val in = staged.count()
    val out = part.count()
    // Three renames publish the swap. The guarantee is "no partial
    // directories", NOT a single atomic two-way swap: between rename
    // 1 and rename 2 a concurrent reader of the fact sees the
    // partition briefly ABSENT (each rename is itself atomic; the
    // tmp name is dotted so directory listings of `base` skip it).
    // If rename 2 fails (e.g. stageDir on a different filesystem
    // rejects ATOMIC_MOVE), rename 1 is ROLLED BACK so the fact
    // never loses the partition. If rename 3 fails the swap has
    // already been published — the fact is consistent — but the
    // DISPLACED partition would be stranded in the dotted tmp dir,
    // so the error surfaces that path for manual recovery instead of
    // hiding it.
    val tmp = Paths.get(base, s".exchange_tmp_${System.nanoTime()}")
    Files.move(Paths.get(partDir), tmp, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(Paths.get(stageDir), Paths.get(partDir),
      StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      Files.move(tmp, Paths.get(partDir), StandardCopyOption.ATOMIC_MOVE)
      throw new IllegalStateException(
        s"exchange aborted and rolled back: staging table could not " +
          s"be published (${e.getMessage})", e)
    }
    try Files.move(tmp, Paths.get(stageDir), StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      throw new IllegalStateException(
        s"exchange PUBLISHED but the displaced partition is stranded " +
          s"at $tmp — move it to $stageDir to finish (${e.getMessage})", e)
    }
    (in, out)
  }
}
