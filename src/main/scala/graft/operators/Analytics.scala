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
  )
}
