package graft

import graft.tools.Acl
import org.apache.spark.sql.functions._

class Wave17Spec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  // --- SET ROLE activation (executor/simple.go:154/:158) ---

  test("setRole: activating an un-granted role throws, store unchanged") {
    Acl.clear()
    Acl.grant("readers", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grantRole("readers", "u1")
    intercept[IllegalArgumentException] {
      Acl.setRole("u1", "%", Seq("admins"))
    }
    // The failed SET ROLE must not have half-applied: activation
    // state is still "never set" -> nothing active.
    assert(!Acl.verify("u1", "%", "graft", "customer", "SELECT",
      honorActiveRoles = true))
    // ...while the fold-all compat default still sees the grant.
    assert(Acl.verify("u1", "%", "graft", "customer", "SELECT"))
    Acl.clear()
  }

  test("setDefaultRole validates grants and applies at LOGIN only") {
    Acl.clear()
    Acl.grant("writers", Seq("SELECT"), db = "graft", tbl = "orders")
    Acl.grantRole("writers", "u2")
    intercept[IllegalArgumentException] {
      Acl.setDefaultRole("u2", "%", Seq("nosuch"))
    }
    Acl.setDefaultRole("u2", "%", Seq("writers"))
    // Stored default does NOT touch the live session (the
    // reference's semantics: defaults apply at authentication).
    assert(!Acl.verify("u2", "%", "graft", "orders", "SELECT",
      honorActiveRoles = true))
    Acl.login("u2", "%")
    assert(Acl.verify("u2", "%", "graft", "orders", "SELECT",
      honorActiveRoles = true))
    Acl.clear()
  }

  test("activation closure: SET ROLE on a chain head folds inherited " +
    "roles; deactivation flips verify") {
    Acl.clear()
    Acl.grant("r_base", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grantRole("r_base", "r_mid") // role-to-role edge
    Acl.grantRole("r_mid", "u3")     // only r_mid granted directly
    Acl.setRole("u3", "%", Seq("r_mid"))
    // Activating r_mid activates everything it inherits (r_base).
    assert(Acl.verify("u3", "%", "graft", "customer", "SELECT",
      honorActiveRoles = true))
    Acl.setRoleNone("u3", "%")
    assert(!Acl.verify("u3", "%", "graft", "customer", "SELECT",
      honorActiveRoles = true))
    Acl.clear()
  }

  test("showGrants honoring activation: scopes follow the active set, " +
    "role lines render regardless") {
    Acl.clear()
    Acl.grant("readers", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grantRole("readers", "u4")
    Acl.login("u4", "%") // activate-none default
    val inactive = Acl.showGrants("u4", "%", honorActiveRoles = true)
    assert(inactive.exists(_.startsWith("GRANT USAGE ON *.*")),
      s"deactivated role still folded: $inactive")
    assert(inactive.exists(_.contains("GRANT 'readers'@'%' TO 'u4'@'%'")))
    Acl.setRoleAll("u4", "%")
    val active = Acl.showGrants("u4", "%", honorActiveRoles = true)
    assert(active.exists(_.contains(
      "GRANT SELECT ON graft.customer TO 'u4'@'%'")), active.toString)
    // The fold-all compat default is unchanged by activation state.
    Acl.setRoleNone("u4", "%")
    assert(Acl.showGrants("u4", "%").exists(_.contains(
      "GRANT SELECT ON graft.customer TO 'u4'@'%'")))
    Acl.clear()
  }

  // --- SHOW COLLATION / SHOW INDEX / ADMIN RECOVER cards ---

  test("q_show_collation: sensitivity flags derive from real " +
    "comparators and agree with the collate entries' semantics") {
    val rows = q("q_show_collation").collect()
    assert(rows.length == 9)
    val byName = rows.map(r =>
      r.getAs[String]("collation_name") -> r).toMap
    // _bin collations: case and accent sensitive, sortlen 1.
    for (c <- Seq("utf8mb4_bin", "ascii_bin", "binary")) {
      assert(byName(c).getAs[Int]("case_sensitive") == 1, c)
      assert(byName(c).getAs[Int]("accent_sensitive") == 1, c)
      assert(byName(c).getAs[Int]("sortlen") == 1, c)
    }
    // general_ci: case-folds, accent-sensitive (the q_func_collate
    // UTF8_LCASE contract); unicode_ci: folds both (UNICODE_CI_AI).
    assert(byName("utf8mb4_general_ci").getAs[Int]("case_sensitive") == 0)
    assert(byName("utf8mb4_general_ci").getAs[Int]("accent_sensitive") == 1)
    assert(byName("utf8mb4_unicode_ci").getAs[Int]("accent_sensitive") == 0)
    // Exactly one default collation per charset, and it matches the
    // SHARED descriptor table q_show_charset renders.
    val defaults = rows.filter(_.getAs[Int]("is_default") == 1)
      .map(r => r.getAs[String]("charset") ->
        r.getAs[String]("collation_name")).toMap
    assert(defaults == graft.operators.Charsets.defaultCollation)
  }

  test("q_show_index: partition counts come from the layouts on disk") {
    val rows = q("q_show_index").collect()
    val byTable = rows.map(r =>
      r.getAs[String]("table_name") -> r.getAs[Int]("n_partitions")).toMap
    // One file per bucket (the repartition-before-bucketBy contract
    // the zero-Sort merge join depends on).
    assert(byTable("graft_b_orders") ==
      graft.sources.Bucketing.PairBuckets)
    assert(byTable("graft_b_customer") ==
      graft.sources.Bucketing.PairBuckets)
    assert(byTable("orders_custhash") ==
      graft.sources.PartitionedFact.HashBuckets)
    // List layout: one directory per NAMED partition.
    assert(byTable("orders_prioritylist") ==
      graft.sources.PartitionedFact.PriorityLists.values.toSet.size)
    // Drift detection is real: the range layout's count equals the
    // distinct ship months in the source data, recomputed here.
    val months = t.lineitem
      .select(date_format(col("l_shipdate"), "yyyy-MM")).distinct().count()
    assert(byTable("lineitem_shipmonth") == months)
  }

  test("q_admin_recover leaves the MV byte-consistent: a fresh admin " +
    "check after the entry is all-green") {
    val rows = q("q_admin_recover").collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("consistent")))
    // The repair really landed: the persisted snapshot now merges to
    // the base recompute (the q_admin_check machinery, re-run cold).
    val again = q("q_admin_check").collect()
    assert(again.forall(_.getAs[Boolean]("consistent")))
  }
}
