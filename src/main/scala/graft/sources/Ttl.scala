package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** TTL sweep over a date-partitioned layout (reference: TiDB TTL
  * tables — ttl/ttlworker scans and deletes rows whose time column
  * fell past the retention watermark, in bounded batches, as a
  * background job). The scale shape this implements is what makes
  * TTL affordable at 100 TB: partitions ENTIRELY below the watermark
  * are dropped by metadata (one directory unlink — zero rows read),
  * only the single BOUNDARY partition (the day the watermark falls
  * in) pays a row-level rewrite, and every newer partition is not
  * touched at all. Row-level TTL without the partition layout would
  * scan and rewrite the whole table. */
object Ttl {

  /** Sweep `base` (dirs `day=yyyy-MM-dd`, rows carrying `tsCol`):
    * drop whole days before the watermark's day, rewrite the
    * watermark's own day keeping rows with ts ≥ watermark. Returns
    * (partitions dropped, partitions rewritten). The boundary
    * rewrite publishes via write-to-temp + atomic rename, so a
    * concurrent reader never sees a half-written day. */
  def sweep(spark: SparkSession, base: String, tsCol: String,
      watermark: java.sql.Timestamp): (Int, Int) = {
    // Day resolved in UTC explicitly: the layout's day= strings come
    // from the UTC session (date_format under session tz), while
    // Timestamp.toLocalDateTime would use the JVM default zone — a
    // non-UTC host would shift the boundary day.
    val wmDay = watermark.toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val parts = Option(new File(base).listFiles()).getOrElse(Array())
      .filter(d => d.isDirectory && d.getName.startsWith("day="))
    var dropped = 0
    var rewritten = 0
    parts.sortBy(_.getName).foreach { d =>
      val day = d.getName.stripPrefix("day=")
      if (day < wmDay) {
        Formats.deleteRecursively(d)
        dropped += 1
      } else if (day == wmDay) {
        val boundary = spark.read.parquet(d.toString)
        // Skip the rewrite when nothing in the boundary day expired:
        // an hourly TTL job whose watermark stays inside one day must
        // not churn that day's files on every invocation.
        if (boundary.filter(col(tsCol) < watermark).isEmpty) ()
        else {
          val tmp = new File(base, s".ttl_tmp_${System.nanoTime()}")
          boundary.filter(col(tsCol) >= watermark)
            .write.parquet(tmp.toString)
          // Publish atomically: old day renamed aside first (readers
          // see the complete old day or the complete new one, never a
          // half-deleted dir), then the swap, then the trash delete.
          val trash = new File(base, s".ttl_trash_${System.nanoTime()}")
          Files.move(d.toPath, trash.toPath,
            StandardCopyOption.ATOMIC_MOVE)
          Files.move(tmp.toPath, d.toPath,
            StandardCopyOption.ATOMIC_MOVE)
          Formats.deleteRecursively(trash)
          rewritten += 1
        }
      }
      // day > wmDay: untouched — not opened, not listed, not
      // rewritten (spec-asserted via file-name stability).
    }
    (dropped, rewritten)
  }
}
