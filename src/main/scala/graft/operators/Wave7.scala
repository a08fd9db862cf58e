package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-6 capability wave: delimiter-controlled export. */
object Wave7 {

  /** Export dialect — mirrors the reference's FIELDS/LINES clauses. */
  def exportDir(t: Tables): String =
    s"/tmp/graft_export_${graft.sources.Formats.sanitize(t.dir)}"

  val all: Seq[Q] = Seq(

    // Delimited EXPORT (reference: executor/select_into.go — SELECT
    // ... INTO OUTFILE with FIELDS TERMINATED BY / ENCLOSED BY /
    // ESCAPED BY and LINES TERMINATED BY). The engine writes the
    // selection as pipe-delimited, quote-enclosed, backslash-escaped
    // csv shards — the payload embeds the field delimiter, the quote
    // char and a line break, so enclosing and escaping are actually
    // exercised, not just configured — then reads the export back
    // with the same dialect. The oracle states the original
    // selection: round-trip fidelity IS the correctness claim.
    // Scale: the write is a plain sharded sink (one file per task,
    // no coalesce), the read-back a parallel scan with an explicit
    // schema; nothing touches the driver.
    Q("q_export_csv", Some("""
      SELECT c_custkey,
             c_name || '|"' || chr(10) || 'x' AS payload,
             c_acctbal
      FROM customer WHERE c_custkey < 500
    """)) { t =>
      val sel = t.customer.filter(col("c_custkey") < 500)
        .select(col("c_custkey"),
          concat(col("c_name"), lit("|\"\nx")).as("payload"),
          col("c_acctbal"))
      val dir = exportDir(t)
      sel.write.mode("overwrite")
        .option("sep", "|").option("quote", "\"").option("escape", "\\")
        .option("header", "true")
        .csv(dir)
      t.customer.sparkSession.read
        .option("sep", "|").option("quote", "\"").option("escape", "\\")
        .option("header", "true").option("multiLine", "true")
        .schema("c_custkey bigint, payload string, c_acctbal double")
        .csv(dir)
    },
  )
}
