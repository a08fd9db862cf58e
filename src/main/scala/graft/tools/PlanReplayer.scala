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
  *    sources.Stats holds the richer per-column view);
  *  - `conf.json` — the planner-relevant session confs (AQE, join
  *    thresholds, shuffle width, ANSI).
  *
  * Everything is text in one directory — the bundle diffs, greps and
  * mails like the reference's zip. Metadata-only except the O(1)
  * per-table counts.
  */
object PlanReplayer {

  /** Planner-relevant session confs captured in the bundle. */
  val PlannerConfs: Seq[String] = Seq(
    "spark.sql.adaptive.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.shuffle.partitions",
    "spark.sql.ansi.enabled",
    "spark.sql.optimizer.excludedRules")

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
      .map { case (tn, tdf) => s"""  "$tn": ${tdf.count()}""" }
      .mkString("{\n", ",\n", "\n}")
    val conf = PlannerConfs
      .map(k => s"""  "$k": "${t.spark.conf.getOption(k).getOrElse("")}"""")
      .mkString("{\n", ",\n", "\n}")
    Seq(
      write("plan.txt", s"-- PLAN REPLAYER DUMP: $name\n$plan"),
      write("schema.sql", schema),
      write("stats.json", stats),
      write("conf.json", conf))
  }
}
