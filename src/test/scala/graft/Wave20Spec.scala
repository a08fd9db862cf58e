package graft

import org.apache.spark.sql.functions._

/** Table-level locks and table renames. */
class Wave20Spec extends SparkSpecBase {

  private def q(name: String) = Registry.byName(name).run(t)

  test("q_lock_tables: the WRITE/READ lattice holds and UNLOCK " +
    "releases the whole session set") {
    val rows = q("q_lock_tables").collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Int]("acquired"), r.getAs[Int]("conflicts"))).toMap
    assert(rows("1_a_write_orders") == (1, 0))
    assert(rows("2_b_read_orders") == (0, 1)) // WRITE blocks READ
    assert(rows("4_c_read_customer") == (1, 0)) // READ coexists
    assert(rows("5_c_write_customer") == (0, 1)) // READ blocks WRITE
    assert(rows("6_b_read_after_unlock") == (1, 0))
  }

  test("table locks and row locks share one lattice but distinct " +
    "scopes — a table WRITE lock does not shadow row keys") {
    val L = graft.tools.RowLocks
    L.clear()
    assert(L.acquire("A", "TABLE:orders", Seq(0L),
      exclusive = true) == (1L, 0L))
    // Row-scope locks on the same table name live in their own
    // (table, key) space and stay acquirable.
    assert(L.acquire("B", "orders", Seq(0L, 7L),
      exclusive = true) == (2L, 0L))
    L.clear()
  }

  test("q_rename_table: rename is re-runnable (fixtures rebuilt), " +
    "swap really exchanges contents, old identity errors") {
    val first = q("q_rename_table").collect()
      .map(r => r.getAs[String]("fact") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("total"))).toMap
    assert(first("old_name_gone")._1 == 1L)
    // The swap exchanged contents: rt_a now holds the %13 subset.
    val n13 = t.orders.filter(col("o_orderkey") % 13 === 0).count()
    val n11 = t.orders.filter(col("o_orderkey") % 11 === 0).count()
    assert(first("swap_a_is_b")._1 == n13)
    assert(first("swap_b_is_a")._1 == n11)
    assert(first("renamed_serves")._1 == n11)
    // Re-run: the entry rebuilds its fixtures, same card.
    val second = q("q_rename_table").collect()
      .map(r => r.getAs[String]("fact") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("total"))).toMap
    assert(second == first)
  }

  test("q_explain_for: the census resolves through the live " +
    "processlist and totals the full optimized plan") {
    val rows = q("q_explain_for").collect()
    assert(rows.forall(_.getAs[String]("statement") == "q_tpch_q3"))
    // Recompute the census independently from the entry's own plan.
    val plan = Registry.byName("q_tpch_q3").run(t)
      .queryExecution.optimizedPlan
    val total = plan.collect { case n => n }.size
    assert(rows.map(_.getAs[Int]("n_nodes")).sum == total,
      "census dropped a node")
  }
}
