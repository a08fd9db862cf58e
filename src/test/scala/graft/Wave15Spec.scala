package graft

import graft.tools.Acl
import org.apache.spark.sql.functions._

class Wave15Spec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  // --- ACL store / SHOW GRANTS (show.go:1497, cache.go:1170) ---

  test("Acl: unknown principal renders nothing, created renders USAGE") {
    Acl.clear()
    assert(Acl.showGrants("ghost").isEmpty)
    Acl.createUser("u1")
    assert(Acl.showGrants("u1") ==
      Seq("GRANT USAGE ON *.* TO 'u1'@'%'"))
    Acl.clear()
  }

  test("Acl: revoking every privilege falls back to USAGE, not absence") {
    Acl.clear()
    Acl.grant("u2", Seq("SELECT", "INSERT"))
    assert(Acl.showGrants("u2") ==
      Seq("GRANT SELECT,INSERT ON *.* TO 'u2'@'%'"))
    Acl.revoke("u2", Seq("ALL"))
    // The principal still exists — MySQL renders USAGE (cache.go's
    // hasGlobalGrant convention), never an empty result.
    assert(Acl.showGrants("u2") ==
      Seq("GRANT USAGE ON *.* TO 'u2'@'%'"))
    Acl.clear()
  }

  test("Acl: full scope mask renders the ALL PRIVILEGES literal") {
    Acl.clear()
    Acl.grant("u3", Seq("ALL"))
    assert(Acl.showGrants("u3") ==
      Seq("GRANT ALL PRIVILEGES ON *.* TO 'u3'@'%'"))
    Acl.clear()
  }

  test("Acl: role closure is transitive and cycle-safe") {
    Acl.clear()
    // r1 -> r2 -> u4, plus a back-edge r2 -> r1 forming a cycle: the
    // closure must terminate and still fold both roles' grants.
    Acl.grant("r1", Seq("SELECT"), db = "d")
    Acl.grant("r2", Seq("INSERT"), db = "d")
    Acl.grantRole("r1", "r2")
    Acl.grantRole("r2", "r1")
    Acl.grantRole("r2", "u4")
    val gs = Acl.showGrants("u4")
    assert(gs.contains("GRANT SELECT,INSERT ON d.* TO 'u4'@'%'"), gs)
    assert(gs.contains("GRANT 'r2'@'%' TO 'u4'@'%'"), gs)
    Acl.clear()
  }

  test("Acl: host is part of the principal identity") {
    Acl.clear()
    Acl.grant("u5", Seq("SELECT"), host = "localhost")
    assert(Acl.showGrants("u5", "localhost") ==
      Seq("GRANT SELECT ON *.* TO 'u5'@'localhost'"))
    // Same name at another host is a DIFFERENT principal (the
    // user@host identity model) — unknown here.
    assert(Acl.showGrants("u5", "%").isEmpty)
    Acl.clear()
  }

  test("q_show_grants renders the pinned scenario deterministically") {
    val rows = q("q_show_grants").collect()
    assert(rows.length == 8)
    // Re-running re-seeds from clear() — identical output, no
    // accumulation across runs.
    val again = q("q_show_grants").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // The transitive-closure row: alice's graft.* line folds the
    // SELECT granted to analyst with the SHOW VIEW granted to reader.
    assert(rows.exists(r => r.getString(0) == "alice" &&
      r.getString(2) == "GRANT SELECT,SHOW VIEW ON graft.* TO 'alice'@'%'"))
  }
}
