package graft.operators

import graft.{Q, Tables}
import graft.tools.Acl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 entries: privilege ENFORCEMENT (the leg grants exist
  * for), MODIFY COLUMN type widening, the index-lookup merge join
  * variant, and charset-conversion breadth. */
object Wave16 {

  def all: Seq[Q] = Seq(

    // Privilege ENFORCEMENT — the RequestVerification leg (reference:
    // privilege/privileges/privileges.go:111 — every executor checks
    // it before touching a table; q_show_grants only RENDERS the
    // store). The entry proves the gate inline: a grantless principal
    // and a wrong-host principal must both THROW before any rows
    // move, then the granted principal (SELECT inherited through a
    // role chain, host-exact) reads customer and returns rows
    // IDENTICAL to the unguarded read — which is what the oracle
    // hash-checks. The check is plan-time (driver-side store lookup),
    // so the guarded plan is byte-identical to the unguarded one —
    // free at any scale.
    Q("q_priv_enforce", Some("""
      SELECT c_mktsegment, COUNT(*) AS n_cust,
             CAST(SUM(c_nationkey) AS BIGINT) AS sum_nation
      FROM customer GROUP BY c_mktsegment
    """)) { t =>
      Acl.clear()
      // SELECT on graft.customer flows: readers -> analyst@10.0.0.1.
      Acl.grant("readers", Seq("SELECT"), db = "graft", tbl = "customer")
      Acl.grantRole("readers", "analyst", "10.0.0.1")
      Acl.createUser("intern")
      def deniedThrows(u: String, h: String): Boolean =
        try { Acl.guardedRead(u, h, "graft", "customer")(t.customer); false }
        catch { case _: SecurityException => true }
      require(deniedThrows("intern", "%"),
        "enforcement hole: grantless principal read the table")
      require(deniedThrows("analyst", "%"),
        "enforcement hole: role grant leaked across hosts")
      require(!Acl.verify("analyst", "10.0.0.1", "graft", "orders", "SELECT"),
        "enforcement hole: table-scope grant covered a sibling table")
      Acl.guardedRead("analyst", "10.0.0.1", "graft", "customer")(t.customer)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_nationkey")).cast("long").as("sum_nation"))
    },
  )
}
