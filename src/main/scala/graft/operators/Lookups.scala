package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Key-lookup and multi-predicate scan shapes (reference:
  * executor/point_get.go, executor/batch_point_get.go,
  * executor/index_merge_reader.go).
  *
  * The reference serves these via TiKV point-gets and index unions;
  * the Spark-native realization is predicate PUSHDOWN — the lookup
  * keys and the OR-disjunction both reach the parquet reader as
  * PushedFilters (row-group / page skipping via min-max + bloom
  * stats), which is the columnar analog of an index probe. On a
  * partitioned warehouse layout the same predicates also prune
  * partitions (see q_scan_partition). PlanShapeSpec asserts the
  * filters actually land in the scan.
  */
object Lookups {

  val all: Seq[Q] = Seq(

    // PointGetExecutor analog: single composite-key lookup. The
    // equality predicates reach the scan; with a sorted/bucketed or
    // partitioned layout this reads one file's one row group.
    Q("q_point_get", Some("""
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             l_extendedprice
      FROM lineitem WHERE l_orderkey = 96 AND l_linenumber = 1
    """)) { t =>
      t.lineitem
        .filter(col("l_orderkey") === 96 && col("l_linenumber") === 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "l_extendedprice")
    },

    // BatchPointGetExecutor analog: IN-list key batch. Spark pushes
    // the In filter to parquet (bloom/dictionary skipping); output
    // stays deterministic via explicit columns.
    Q("q_batch_get", Some("""
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      FROM lineitem
      WHERE l_orderkey IN (19, 24, 96, 781, 1491)
    """)) { t =>
      t.lineitem
        .filter(col("l_orderkey").isin(19L, 24L, 96L, 781L, 1491L))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    },

    // IndexMergeReader analog: a disjunction across DIFFERENT columns
    // (the reference unions two index scans and dedups by row id).
    // Columnar engines don't need the union: the whole Or(...)
    // composite pushes to the scan and each row group is skipped when
    // NEITHER branch can match its min-max stats. One scan, no dedup.
    Q("q_scan_indexmerge", Some("""
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(l_quantity >= 49 AS INT)) AS BIGINT) AS n_hiqty,
             CAST(SUM(CAST(l_discount <= 0.01 AS INT)) AS BIGINT) AS n_lodisc
      FROM lineitem
      WHERE l_quantity >= 49 OR l_discount <= 0.01
      GROUP BY l_returnflag
    """)) { t =>
      t.lineitem
        .filter(col("l_quantity") >= 49 || col("l_discount") <= 0.01)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum((col("l_quantity") >= 49).cast("int")).as("n_hiqty"),
          sum((col("l_discount") <= 0.01).cast("int")).as("n_lodisc"))
    },
  )
}
