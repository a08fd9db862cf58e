package graft

import graft.tools.Acl

class Wave18Spec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  // --- REVOKE (executor/revoke.go, executor/simple.go revoke role) ---

  test("revoke of an un-held privilege is a no-op, never an error") {
    Acl.clear()
    Acl.grant("u", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.revoke("u", Seq("DELETE"), db = "graft", tbl = "customer")
    assert(Acl.verify("u", "%", "graft", "customer", "SELECT"))
    // Revoking at a DIFFERENT scope leaves the held scope alone.
    Acl.revoke("u", Seq("SELECT"), db = "graft", tbl = "orders")
    assert(Acl.verify("u", "%", "graft", "customer", "SELECT"))
    Acl.clear()
  }

  test("revokeRole scrubs the role from ACTIVE and DEFAULT sets — a " +
    "revoked role stops contributing mid-session") {
    Acl.clear()
    Acl.grant("r1", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grantRole("r1", "u")
    Acl.setRole("u", "%", Seq("r1"))
    Acl.setDefaultRole("u", "%", Seq("r1"))
    assert(Acl.verify("u", "%", "graft", "customer", "SELECT",
      honorActiveRoles = true))
    Acl.revokeRole("r1", "u")
    assert(!Acl.verify("u", "%", "graft", "customer", "SELECT",
      honorActiveRoles = true))
    assert(!Acl.verify("u", "%", "graft", "customer", "SELECT"))
    // The stored default no longer re-activates it at login either.
    Acl.login("u", "%")
    assert(!Acl.verify("u", "%", "graft", "customer", "SELECT",
      honorActiveRoles = true))
    Acl.clear()
  }

  // --- CREATE/ALTER/DROP USER (executor/simple.go:137-142) ---

  test("duplicate CREATE USER throws; the original credentials survive") {
    Acl.clear()
    Acl.createUser("dup", "%", "first")
    intercept[IllegalArgumentException] {
      Acl.createUser("dup", "%", "second")
    }
    assert(Acl.checkPassword("dup", "%", "first"))
    assert(!Acl.checkPassword("dup", "%", "second"))
    Acl.clear()
  }

  test("dropUser cascades: privileges, role edges, auth, and session " +
    "state all go; a re-created principal starts FRESH") {
    Acl.clear()
    Acl.createUser("vic", "%", "pw1")
    Acl.grant("vic", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grant("r1", Seq("SELECT"), db = "graft", tbl = "orders")
    Acl.grantRole("r1", "vic")
    Acl.setRole("vic", "%", Seq("r1"))
    Acl.dropUser("vic", "%")
    assert(!Acl.verify("vic", "%", "graft", "customer", "SELECT"))
    assert(Acl.showGrants("vic", "%").isEmpty) // unknown principal
    assert(!Acl.checkPassword("vic", "%", "pw1"))
    // Re-created: registered again, but with NONE of the old grants.
    Acl.createUser("vic", "%", "pw2")
    assert(!Acl.verify("vic", "%", "graft", "customer", "SELECT"))
    assert(!Acl.verify("vic", "%", "graft", "orders", "SELECT"))
    assert(Acl.checkPassword("vic", "%", "pw2"))
    Acl.clear()
  }

  test("dropping a ROLE severs every grantee's inheritance through it") {
    Acl.clear()
    Acl.grant("shared_r", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grantRole("shared_r", "u1")
    Acl.grantRole("shared_r", "u2")
    assert(Acl.verify("u1", "%", "graft", "customer", "SELECT"))
    Acl.dropUser("shared_r", "%") // DROP ROLE
    assert(!Acl.verify("u1", "%", "graft", "customer", "SELECT"))
    assert(!Acl.verify("u2", "%", "graft", "customer", "SELECT"))
    // The edge itself is gone from the grantees' renders.
    assert(!Acl.showGrants("u1", "%").exists(_.contains("shared_r")))
    Acl.clear()
  }

  test("encodePassword matches the MySQL-documented digest form") {
    // SHA1(SHA1('password')) is the RFC-checkable MySQL doc example:
    // PASSWORD('password') = *2470C0C06DEE42FD1618BB99005ADCA2EC9D1E19
    assert(Acl.encodePassword("password") ==
      "*2470C0C06DEE42FD1618BB99005ADCA2EC9D1E19")
  }

  test("q_revoke and q_user_admin cards run end-to-end with rows") {
    assert(q("q_revoke").count() == 4)
    assert(q("q_user_admin").count() == 2)
  }
}
