package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Batch DML analogs of the reference's write executors
  * (reference: executor/insert.go ON DUPLICATE KEY UPDATE,
  * executor/replace.go REPLACE INTO). In a Spark warehouse the same
  * semantics run as a snapshot MERGE: matched keys take the update's
  * columns, unmatched update rows append, untouched base rows flow
  * through unchanged.
  *
  * Scale: one full-outer join co-partitioned on the key — both sides
  * shuffle once, nothing touches the driver, and the result is
  * directly writable as the next snapshot. At 100 TB the base table
  * is date/key-partitioned and the merge overwrites only the
  * partitions the update set touches (the update side is typically
  * orders of magnitude smaller and broadcast by AQE).
  */
object Dml {

  val all: Seq[Q] = Seq(

    // INSERT ... ON DUPLICATE KEY UPDATE / REPLACE semantics: the
    // update set changes every 7th order's status+price and appends
    // fresh keys derived from every 97th order. The oracle states the
    // same merge as LEFT JOIN (matched/passthrough) ∪ ANTI JOIN
    // (appends); the engine runs the single full-outer form.
    Q("q_upsert", Some("""
      WITH upd AS (
        SELECT o_orderkey, o_custkey, 'P' AS o_orderstatus,
               o_totalprice + 100.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'N', 0.0
        FROM orders WHERE o_orderkey % 97 = 0)
      SELECT b.o_orderkey,
             COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
             COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
             COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice
      FROM orders b LEFT JOIN upd u USING (o_orderkey)
      UNION ALL
      SELECT u.o_orderkey, u.o_custkey, u.o_orderstatus, u.o_totalprice
      FROM upd u ANTI JOIN orders b USING (o_orderkey)
    """)) { t =>
      val base = t.orders
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val upd = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("P").as("o_orderstatus"),
          (col("o_totalprice") + 100.0).as("o_totalprice"))
        .union(base.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_custkey"), lit("N").as("o_orderstatus"),
            lit(0.0).as("o_totalprice")))
      base.as("b").join(upd.as("u"), Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          coalesce(col("u.o_custkey"), col("b.o_custkey")).as("o_custkey"),
          coalesce(col("u.o_orderstatus"), col("b.o_orderstatus"))
            .as("o_orderstatus"),
          coalesce(col("u.o_totalprice"), col("b.o_totalprice"))
            .as("o_totalprice"))
    },

    // Dense row-id ALLOCATION (reference: TiDB assigns _tidb_rowid /
    // AUTO_INCREMENT batches per insert — ddl/ + tablecodec rowid
    // allocators). The distributed analog hands every row a gapless
    // global ordinal WITHOUT a global window: (1) per-range
    // row_number over a PARTITIONed window (range = source here, any
    // bounded key works), (2) range COUNTS — one row per range —
    // prefix-summed in the tiny phase and broadcast back. Same
    // two-phase prefix shape as t_pack; monotonically_increasing_id
    // can't do this (its ids are sparse per-partition blocks). The
    // oracle is the naive single-task ROW_NUMBER.
    Q("q_id_assign", Some("""
      SELECT doc_id, source,
             ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS row_id
      FROM documents
    """)) { t =>
      PrefixSum.rowNumberBefore(
          t.documents.select(col("doc_id"), col("source")),
          rangeCol = "source", orderCols = Seq("doc_id"), out = "row_id")
        .select("doc_id", "source", "row_id")
    },

    // Incremental MATERIALIZED-VIEW refresh: a persisted aggregate
    // over the historical slice is combined with a partial aggregate
    // of only the NEW slice — algebraic aggregates (count, sum) merge
    // by summation, so the refresh never rescans history (reference
    // analog: statistics/handle's incremental stats maintenance; the
    // warehouse version of TiFlash's delta-tree merging base + delta).
    // The MV is lazily materialized under /tmp keyed by a content
    // fingerprint of the source (same stale-safe layout as the IVF
    // index / corpus fingerprints). At 100 TB the delta is a day
    // partition and the merge touches |groups| + |delta| rows. Money
    // sums run in DECIMAL and surface as DOUBLE (exact — 2dp values
    // well under 2^53), the suite's money convention. The oracle
    // recomputes the aggregate from scratch: merged == full is the
    // correctness statement.
    Q("q_mv_refresh", Some("""
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY o_orderpriority
    """)) { t =>
      val split = "1997-01-01"
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val F = graft.sources.Formats
      val mvDir = F.cacheDir(
        s"/tmp/graft_mv_${F.sanitize(t.dir)}",
        F.contentFingerprint(s"${t.dir}/orders.parquet"))
      if (!new java.io.File(s"$mvDir/_SUCCESS").exists())
        partial(t.orders.filter(col("o_orderdate") < split))
          .write.mode("overwrite").parquet(mvDir)
      val mv = t.orders.sparkSession.read.parquet(mvDir)
      val delta = partial(t.orders.filter(col("o_orderdate") >= split))
      mv.union(delta)
        .groupBy("o_orderpriority")
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
    },
  )
}
