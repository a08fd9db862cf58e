package graft.tools

import graft.{Registry, Tables}
import graft.operators.Catalog
import java.nio.file.{Files, Paths}

/** PLAN REPLAYER (reference: executor/plan_replayer.go
  * PlanReplayerSingleExec — `PLAN REPLAYER DUMP EXPLAIN <stmt>`
  * packages everything a support engineer needs to reproduce a
  * planning decision OFF the production cluster: the statement, its
  * plan, the schemas involved, table stats, and the session
  * variables that influence planning).
  *
  * The Spark twin dumps, for any registry entry:
  *  - `plan.txt` — the extended explain (parsed/analyzed/optimized/
  *    physical, the full planning story);
  *  - `schema.sql` — CREATE TABLE DDL for the whole catalog (the
  *    q_show_create renderer — reproducing planning needs the
  *    schemas even for tables the plan pruned away);
  *  - `stats.json` — per-table row counts (the CBO's primary input;
  *    sources.Stats holds the richer per-column view). Counts come
  *    from the PARQUET FOOTERS of the table's input files — a
  *    driver-side metadata read, O(#files), no data scanned; a
  *    catalog entry that is not a plain file scan (no input files)
  *    falls back to a count() job and is marked `"scanned": true`;
  *  - `conf.json` — the planner-relevant session confs (AQE, join
  *    thresholds, shuffle width, ANSI).
  *
  * Everything is text in one directory — the bundle diffs, greps and
  * mails like the reference's zip. All string values are
  * JSON-escaped, so a quote or backslash in a conf value cannot
  * break the bundle.
  */
object PlanReplayer {

  /** Planner-relevant session confs captured in the bundle. */
  val PlannerConfs: Seq[String] = Seq(
    "spark.sql.adaptive.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.shuffle.partitions",
    "spark.sql.ansi.enabled",
    "spark.sql.optimizer.excludedRules")

  /** JSON string escape — the shared [[JsonText]] escaper. */
  private def esc(s: String): String = JsonText.esc(s)

  /** Row count from one parquet file's footer — a metadata read of
    * the file tail, no row groups decoded. */
  private def footerRowCount(t: Tables, file: String): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      t.spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Dump the bundle for registry entry `name`; returns the files
    * written. Unknown names throw (Registry.byName). */
  def dump(name: String, t: Tables, outDir: String): Seq[String] = {
    val df = Registry.byName(name).run(t)
    Files.createDirectories(Paths.get(outDir))
    def write(file: String, content: String): String = {
      val p = s"$outDir/$file"
      Files.writeString(Paths.get(p), content)
      p
    }
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    val schema = Catalog.pinned.groupBy(_._1).toSeq
      .sortBy(g => Catalog.pinned.indexWhere(_._1 == g._1))
      .map { case (tn, cols) =>
        cols.sortBy(_._2).map(c => s"  ${c._3} ${c._4}")
          .mkString(s"CREATE TABLE $tn (\n", ",\n", "\n);")
      }.mkString("\n\n")
    val stats = Catalog.tables(t)
      .map { case (tn, tdf) =>
        // Footer counts are only the table's row count when the plan
        // is a BARE file-source scan whose files are ALL parquet — a
        // wrapped filter/limit/union (or a mixed-format table) must
        // fall back to count(), or the footers would overstate rows.
        val bareScan = tdf.queryExecution.optimizedPlan match {
          case _: org.apache.spark.sql.execution.datasources
            .LogicalRelation => true
          case _ => false
        }
        val files = tdf.inputFiles
        if (bareScan && files.nonEmpty &&
            files.forall(_.endsWith(".parquet"))) {
          val n = files.map(footerRowCount(t, _)).sum
          s"""  "${esc(tn)}": {"rows": $n, "scanned": false}"""
        } else {
          s"""  "${esc(tn)}": {"rows": ${tdf.count()}, "scanned": true}"""
        }
      }
      .mkString("{\n", ",\n", "\n}")
    val conf = PlannerConfs
      .map(k => s"""  "${esc(k)}": "${esc(
        t.spark.conf.getOption(k).getOrElse(""))}"""")
      .mkString("{\n", ",\n", "\n}")
    Seq(
      write("plan.txt", s"-- PLAN REPLAYER DUMP: $name\n$plan"),
      write("schema.sql", schema),
      write("stats.json", stats),
      write("conf.json", conf))
  }
}
