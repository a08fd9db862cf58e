package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 wave: the ALTER SEQUENCE lifecycle — the last `*Stmt` in
  * the reference's parser inventory with no mutating entry
  * (parser/ast/ddl.go AlterSequenceStmt; ddl/sequence.go alter path).
  */
object Wave22 {

  /** One allocation epoch of the q_sequence arithmetic at the
    * parameters the [[graft.tools.Sequences]] store holds RIGHT NOW:
    * 4 sessions lease `cache`-value blocks session-ordered (the
    * 4-row exclusive-prefix window — never over the data), the
    * per-session dense rank comes from the grouped two-phase prefix
    * sum (parallelism scales with the data, not the 4 sessions), and
    * value r of session s is start + inc·((base_s + r) mod
    * cycleValues). Long-format output (item = s<sid>:<fact>) so both
    * epochs and the SHOW renders stack into ONE comparable card. */
  private def epochFacts(t: Tables, stage: String,
      epochFilter: org.apache.spark.sql.Column,
      d: graft.tools.Sequences.SeqDef): DataFrame = {
    val cache = d.cacheSize
    val s = t.orders.where(epochFilter)
      .select(col("o_orderkey"), (col("o_orderkey") % 4).as("sid"))
    val counts = s.groupBy("sid").agg(count(lit(1)).as("n"))
    val leaseW = Window.orderBy("sid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val leases = counts
      .withColumn("blocks", expr(s"(n + ${cache - 1}) div $cache"))
      .withColumn("base",
        coalesce(sum(col("blocks") * cache).over(leaseW), lit(0L)))
    val ranked = PrefixSum.rowNumberBeforeBy(
      s.withColumn("okbkt", expr("o_orderkey div 1024")),
      "sid", "okbkt", Seq("o_orderkey"), "r")
    val vals = ranked.join(broadcast(leases), "sid")
      .withColumn("seq", lit(d.start) +
        lit(d.increment) * ((col("base") + col("r")) % d.cycleValues))
    vals.groupBy("sid").agg(
        min(col("n")).as("n_rows"),
        min(col("base")).as("block_base"),
        min(col("seq")).as("min_seq"),
        max(col("seq")).as("max_seq"),
        countDistinct(col("seq")).as("n_distinct"),
        min(col("blocks") * cache - col("n")).as("gap_slots"))
      .select(lit(stage).as("stage"), col("sid"), col("n_rows"),
        col("block_base"), col("min_seq"), col("max_seq"),
        col("n_distinct"), col("gap_slots"))
      .selectExpr("stage", """stack(6,
          concat('s', cast(sid as string), ':n_rows'), n_rows,
          concat('s', cast(sid as string), ':block_base'), block_base,
          concat('s', cast(sid as string), ':min_seq'), min_seq,
          concat('s', cast(sid as string), ':max_seq'), max_seq,
          concat('s', cast(sid as string), ':n_distinct'), n_distinct,
          concat('s', cast(sid as string), ':gap_slots'), gap_slots
        ) as (item, value)""")
  }

  val all: Seq[Q] = Seq(

    // ALTER SEQUENCE (reference: parser/ast/ddl.go AlterSequenceStmt;
    // ddl/sequence.go — the alter path recalculates the sequence
    // round base and DISCARDS every node's leased cache block, so
    // post-ALTER allocation re-leases from the restarted base). The
    // card drives the tools.Sequences store through CREATE →
    // allocate (epoch 1: orders before 1995-07-01 at start 1000,
    // inc 1, CACHE 100, MAXVALUE 10999 CYCLE) → ALTER (RESTART WITH
    // 50000, INCREMENT BY 3, MAXVALUE 79997 — same 10000-value
    // cycle) → allocate (epoch 2: the remaining orders). Cache
    // invalidation IS the pinned semantic: epoch-2 block bases start
    // at 0 again (fresh session-ordered leases), not at epoch 1's
    // high-water mark — exactly what a metadata-only edit would get
    // wrong. SHOW renders bracket both epochs; every per-session
    // fact (rows, lease base, min/max value, distinct values,
    // discarded gap slots) is oracle-recomputed from the same
    // arithmetic. Refusal corners (duplicate CREATE, unknown ALTER,
    // zero increment, RESTART past MAXVALUE) are Wave22Spec-pinned.
    Q("q_alter_sequence", Some("""
      WITH e1 AS (
        SELECT o_orderkey, o_orderkey % 4 AS sid FROM orders
        WHERE o_orderdate < DATE '1995-07-01'),
      c1 AS (SELECT sid, COUNT(*) AS n FROM e1 GROUP BY sid),
      b1 AS (SELECT sid, n, (n + 99) // 100 AS blocks,
               COALESCE(SUM((n + 99) // 100 * 100) OVER
                 (ORDER BY sid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS base
             FROM c1),
      r1 AS (SELECT e1.sid, b1.n, b1.blocks, b1.base,
               ROW_NUMBER() OVER (PARTITION BY e1.sid
                                  ORDER BY e1.o_orderkey) - 1 AS r
             FROM e1 JOIN b1 USING (sid)),
      v1 AS (SELECT sid, n, blocks, base,
               CAST(1000 + (base + r) % 10000 AS BIGINT) AS seq
             FROM r1),
      a1 AS (SELECT sid, MIN(n) AS n_rows,
               CAST(MIN(base) AS BIGINT) AS block_base,
               MIN(seq) AS min_seq, MAX(seq) AS max_seq,
               CAST(COUNT(DISTINCT seq) AS BIGINT) AS n_distinct,
               MIN(blocks * 100 - n) AS gap_slots
             FROM v1 GROUP BY sid),
      e2 AS (
        SELECT o_orderkey, o_orderkey % 4 AS sid FROM orders
        WHERE o_orderdate >= DATE '1995-07-01'),
      c2 AS (SELECT sid, COUNT(*) AS n FROM e2 GROUP BY sid),
      b2 AS (SELECT sid, n, (n + 99) // 100 AS blocks,
               COALESCE(SUM((n + 99) // 100 * 100) OVER
                 (ORDER BY sid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS base
             FROM c2),
      r2 AS (SELECT e2.sid, b2.n, b2.blocks, b2.base,
               ROW_NUMBER() OVER (PARTITION BY e2.sid
                                  ORDER BY e2.o_orderkey) - 1 AS r
             FROM e2 JOIN b2 USING (sid)),
      v2 AS (SELECT sid, n, blocks, base,
               CAST(50000 + 3 * ((base + r) % 10000) AS BIGINT) AS seq
             FROM r2),
      a2 AS (SELECT sid, MIN(n) AS n_rows,
               CAST(MIN(base) AS BIGINT) AS block_base,
               MIN(seq) AS min_seq, MAX(seq) AS max_seq,
               CAST(COUNT(DISTINCT seq) AS BIGINT) AS n_distinct,
               MIN(blocks * 100 - n) AS gap_slots
             FROM v2 GROUP BY sid)
      SELECT '1_show_create' AS stage,
             'seq_orders:start=1000:inc=1:cache=100:max=10999:cycle'
               AS item,
             CAST(NULL AS BIGINT) AS value
      UNION ALL SELECT '2_epoch1',
        's' || CAST(sid AS VARCHAR) || ':n_rows', n_rows FROM a1
      UNION ALL SELECT '2_epoch1',
        's' || CAST(sid AS VARCHAR) || ':block_base', block_base FROM a1
      UNION ALL SELECT '2_epoch1',
        's' || CAST(sid AS VARCHAR) || ':min_seq', min_seq FROM a1
      UNION ALL SELECT '2_epoch1',
        's' || CAST(sid AS VARCHAR) || ':max_seq', max_seq FROM a1
      UNION ALL SELECT '2_epoch1',
        's' || CAST(sid AS VARCHAR) || ':n_distinct', n_distinct FROM a1
      UNION ALL SELECT '2_epoch1',
        's' || CAST(sid AS VARCHAR) || ':gap_slots', gap_slots FROM a1
      UNION ALL SELECT '3_show_altered',
        'seq_orders:start=50000:inc=3:cache=100:max=79997:cycle', NULL
      UNION ALL SELECT '4_epoch2',
        's' || CAST(sid AS VARCHAR) || ':n_rows', n_rows FROM a2
      UNION ALL SELECT '4_epoch2',
        's' || CAST(sid AS VARCHAR) || ':block_base', block_base FROM a2
      UNION ALL SELECT '4_epoch2',
        's' || CAST(sid AS VARCHAR) || ':min_seq', min_seq FROM a2
      UNION ALL SELECT '4_epoch2',
        's' || CAST(sid AS VARCHAR) || ':max_seq', max_seq FROM a2
      UNION ALL SELECT '4_epoch2',
        's' || CAST(sid AS VARCHAR) || ':n_distinct', n_distinct FROM a2
      UNION ALL SELECT '4_epoch2',
        's' || CAST(sid AS VARCHAR) || ':gap_slots', gap_slots FROM a2
    """)) { t =>
      import t.spark.implicits._
      val S = graft.tools.Sequences
      S.clear()
      // Global store: clear in a finally (the q_placement_policy
      // discipline) so a mid-entry failure cannot leak the sequence
      // into later renders.
      try {
        S.create("seq_orders", S.SeqDef(start = 1000L, increment = 1L,
          cacheSize = 100L, maxValue = 10999L, cycle = true))
        def showRow(stage: String) =
          Seq((stage, S.render("seq_orders"), Option.empty[Long]))
            .toDF("stage", "item", "value")
        val show1 = showRow("1_show_create")
        val ep1 = epochFacts(t, "2_epoch1",
          col("o_orderdate") < lit("1995-07-01"),
          S.params("seq_orders"))
        // ALTER: restart + stride + range move together; the merged
        // definition keeps the 10000-value cycle. Every leased cache
        // block dies here — epoch 2 allocates from base 0.
        S.alter("seq_orders", restartWith = Some(50000L),
          increment = Some(3L), maxValue = Some(79997L))
        val show3 = showRow("3_show_altered")
        val ep2 = epochFacts(t, "4_epoch2",
          col("o_orderdate") >= lit("1995-07-01"),
          S.params("seq_orders"))
        show1.unionByName(ep1).unionByName(show3).unionByName(ep2)
      } finally S.clear()
    },
  )
}
