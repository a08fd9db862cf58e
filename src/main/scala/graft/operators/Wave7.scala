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

    // Delimited IMPORT (reference: executor/load_data.go — LOAD DATA
    // with FIELDS TERMINATED/ENCLOSED, LINES STARTING BY, and
    // malformed-row tolerance: bad fields become NULL + a warning,
    // the load never aborts). Each engine builds the same raw lines
    // from customer — including a quote-enclosed name embedding the
    // field delimiter, a non-numeric balance field, and a truncated
    // line — then the ENGINE actually parses them (strip the line
    // prefix, from_csv in PERMISSIVE mode with a corrupt-record
    // column) while the oracle states the EXPECTED parse output
    // derived straight from the source columns. Scale: from_csv is a
    // per-row codegen'd expression — the 100 TB shape is this exact
    // parse running inside the scan stage of a raw text read.
    Q("q_import_csv", Some("""
      SELECT c_custkey,
             c_custkey AS id,
             CASE WHEN c_custkey % 5 = 0 THEN c_name || ';q'
                  ELSE c_name END AS nm,
             CASE WHEN c_custkey % 11 = 0 OR c_custkey % 7 = 0 THEN NULL
                  ELSE c_acctbal END AS bal,
             CAST(c_custkey % 11 = 0 OR c_custkey % 7 = 0 AS INT) AS bad
      FROM customer WHERE c_custkey < 600
    """)) { t =>
      val c = col("c_custkey")
      // LINES STARTING BY '##'; FIELDS TERMINATED BY ';' ENCLOSED BY
      // '"'. Every 5th name is enclosed and embeds the delimiter;
      // every 11th balance is non-numeric; every 7th line is
      // truncated after the name.
      val nmField = when(c % 5 === 0,
        concat(lit("\""), col("c_name"), lit(";q\"")))
        .otherwise(col("c_name"))
      val line = concat(lit("##"),
        when(c % 11 === 0, concat_ws(";", c, nmField, lit("xx")))
          .when(c % 7 === 0, concat_ws(";", c, nmField))
          .otherwise(concat_ws(";", c, nmField, col("c_acctbal"))))
      val opts = Map("sep" -> ";", "quote" -> "\"",
        "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_bad")
      t.customer.filter(c < 600)
        .select(c.as("c_custkey"), line.as("line"))
        .withColumn("j", from_csv(
          expr("substring(line, 3)"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, nm STRING, bal DOUBLE, _bad STRING"),
          opts))
        .select(col("c_custkey"), col("j.id").as("id"),
          col("j.nm").as("nm"), col("j.bal").as("bal"),
          col("j._bad").isNotNull.cast("int").as("bad"))
    },
  )
}
