package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Statistical aggregates wave 2 + lateral (per-row correlated)
  * joins — the TiDB aggfuncs families and Apply operator shapes not
  * yet covered (reference: /root/reference/executor/aggfuncs/,
  * executor/join.go Apply → decorrelation in
  * planner/core/rule_decorrelate.go).
  */
object Analytics {

  val all: Seq[Q] = Seq(

    // Correlation / covariance / mode / boolean aggs / count_if.
    Q("q_agg_stats2", Some("""
      SELECT l_returnflag,
             ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
             ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS qp_covar_p,
             ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qp_covar_s,
             CAST(mode(l_linenumber) AS INT) AS mode_line,
             CAST(bool_and(l_quantity > 0) AS INT) AS all_pos,
             CAST(bool_or(l_discount > 0.09) AS INT) AS any_deep_disc,
             CAST(count_if(l_tax > 0.04) AS BIGINT) AS n_high_tax
      FROM lineitem GROUP BY l_returnflag
    """)) { t =>
      t.lineitem.groupBy("l_returnflag").agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("qty_price_corr"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4)
          .as("qp_covar_p"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          .as("qp_covar_s"),
        mode(col("l_linenumber")).cast("int").as("mode_line"),
        bool_and(col("l_quantity") > 0).cast("int").as("all_pos"),
        bool_or(col("l_discount") > 0.09).cast("int").as("any_deep_disc"),
        count_if(col("l_tax") > 0.04).as("n_high_tax"))
    },

    // LATERAL correlated subquery with per-row TopN (the Apply
    // operator): first two line items of each high-value order.
    // Catalyst decorrelates the LIMIT into a ranked window join —
    // asserted in PlanShapeSpec — so nothing executes per-row.
    Q("q_lateral", Some("""
      SELECT o.o_orderkey, o.o_totalprice, l.lk, l.lq
      FROM orders o,
      LATERAL (SELECT l_linenumber AS lk, l_quantity AS lq
               FROM lineitem
               WHERE l_orderkey = o.o_orderkey
               ORDER BY l_linenumber, l_quantity, l_extendedprice LIMIT 2) l
      WHERE o.o_totalprice > 400000
    """)) { t =>
      t.sql("""
        SELECT o.o_orderkey, o.o_totalprice, l.lk, l.lq
        FROM orders o,
        LATERAL (SELECT l_linenumber AS lk, l_quantity AS lq
                 FROM lineitem
                 WHERE l_orderkey = o.o_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice LIMIT 2) l
        WHERE o.o_totalprice > 400000
      """, "orders", "lineitem")
    },

    // INTERSECT ALL / EXCEPT ALL (multiset set ops — TiDB setops
    // keep duplicates under ALL).
    Q("q_setops_all", Some("""
      SELECT src, l_partkey FROM (
        SELECT 'i' AS src, l_partkey FROM
          (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
           INTERSECT ALL
           SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
        UNION ALL
        SELECT 'e' AS src, l_partkey FROM
          (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
           EXCEPT ALL
           SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')) u
      WHERE l_partkey < 200
    """)) { t =>
      val r = t.lineitem.filter(col("l_returnflag") === "R")
        .select("l_partkey")
      val a = t.lineitem.filter(col("l_returnflag") === "A")
        .select("l_partkey")
      r.intersectAll(a).select(lit("i").as("src"), col("l_partkey"))
        .unionAll(
          r.exceptAll(a).select(lit("e").as("src"), col("l_partkey")))
        .filter(col("l_partkey") < 200)
    },

    // Value-RANGE window frame over TIMESTAMPS (window.go range
    // frames): per user, events and spend inside the trailing hour.
    Q("q_window_timerange", Some("""
      SELECT event_id, user_id, ts,
             COUNT(*) OVER w AS n_last_hour,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_last_hour
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """)) { t =>
      t.sql("""
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_last_hour,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      """, "events")
    },
  )
}
