package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 capability wave 3 (session 3): JSON document shredding
  * (the JSON_TABLE relational bridge / jsonl ingest path).
  */
object Wave11 {

  val all: Seq[Q] = Seq(

    // JSON_TABLE — the JSON→relational bridge (reference JSON path
    // machinery: expression/builtin_json.go; MySQL-family JSON_TABLE
    // semantics: one row per array element, path-projected columns,
    // FOR ORDINALITY position). This is also the jsonl ingest shape
    // every training-data pipeline starts from: a document that
    // carries a nested array of records, shredded back to one row per
    // record. Round trip proves both directions: JSON_ARRAYAGG-style
    // nesting (array_sort(collect_list(struct)) → to_json — the sort
    // makes the serialized doc deterministic under any row order) and
    // the shred (from_json with an explicit array schema → posexplode,
    // Spark's native JSON_TABLE). Scale: nesting shuffles each event
    // exactly once on user_id; the shred is pure map-side over the doc
    // column — a billion jsonl docs shred with zero exchanges. The
    // oracle is the identity round trip: the original rows with their
    // per-user ordinal.
    Q("q_json_table", Some("""
      SELECT user_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS INT) AS ord,
             event_id, event_type, value
      FROM events WHERE user_id < 40
    """)) { t =>
      val elem = StructType(Seq(
        StructField("ts", StringType), StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val docs = t.events.filter(col("user_id") < 40)
        .groupBy("user_id")
        .agg(to_json(array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("event_type"),
            col("value"))))).as("doc"))
      docs
        .select(col("user_id"),
          posexplode(from_json(col("doc"), ArrayType(elem))))
        .select(col("user_id"), (col("pos") + 1).cast("int").as("ord"),
          col("col.event_id").as("event_id"),
          col("col.event_type").as("event_type"),
          col("col.value").as("value"))
    },

    // MODE aggregate — most frequent value per group (aggfuncs
    // family; MySQL users emulate it with the same count+rank). Two
    // map-combined aggregations: (group, value) counts, then a
    // per-group argmin over (-count, value) — the smallest-value
    // tie-break makes the answer deterministic on both engines, and
    // a hot group costs map-side partials, never a window sort over
    // raw rows.
    Q("q_agg_mode", Some("""
      WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
                 FROM events GROUP BY user_id, event_type)
      SELECT user_id, event_type AS mode_type, cnt AS mode_n FROM (
        SELECT user_id, event_type, cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type) AS rn
        FROM c) t
      WHERE rn = 1
    """)) { t =>
      t.events.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(expr("min_by(event_type, struct(-cnt, event_type))")
          .as("mode_type"),
          expr("min_by(cnt, struct(-cnt, event_type))").as("mode_n"))
    },
  )
}
