package graft

import graft.tools.Acl
import org.apache.spark.sql.functions._

class Wave16Spec extends SparkSpecBase {

  test("verify: scope lattice — global covers db covers table, exactly") {
    Acl.clear()
    Acl.grant("g", Seq("SELECT"))
    Acl.grant("d", Seq("SELECT"), db = "graft")
    Acl.grant("t1", Seq("SELECT"), db = "graft", tbl = "orders")
    assert(Acl.verify("g", "%", "anydb", "anytbl", "SELECT"))
    assert(Acl.verify("d", "%", "graft", "orders", "SELECT"))
    assert(!Acl.verify("d", "%", "other", "orders", "SELECT"))
    assert(Acl.verify("t1", "%", "graft", "orders", "SELECT"))
    assert(!Acl.verify("t1", "%", "graft", "customer", "SELECT"))
    // privilege kind matters, not just scope
    assert(!Acl.verify("t1", "%", "graft", "orders", "INSERT"))
    Acl.clear()
  }

  test("verify: transitive role closure grants access, cycle-safe") {
    Acl.clear()
    Acl.grant("r_base", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grantRole("r_base", "r_mid")
    Acl.grantRole("r_mid", "u9")
    // cycle between roles must not hang
    Acl.grantRole("r_mid", "r_base")
    assert(Acl.verify("u9", "%", "graft", "customer", "SELECT"))
    assert(!Acl.verify("u9", "%", "graft", "orders", "SELECT"))
    Acl.clear()
  }

  test("host is part of the grantee identity for roles") {
    Acl.clear()
    Acl.grant("readers", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grantRole("readers", "ana", "10.0.0.1")
    assert(Acl.verify("ana", "10.0.0.1", "graft", "customer", "SELECT"))
    assert(!Acl.verify("ana", "%", "graft", "customer", "SELECT"))
    assert(!Acl.verify("ana", "10.0.0.2", "graft", "customer", "SELECT"))
    // SHOW GRANTS renders the role line only for the granted host
    assert(Acl.showGrants("ana", "10.0.0.1")
      .exists(_.contains("GRANT 'readers'@'%' TO 'ana'@'10.0.0.1'")))
    assert(!Acl.showGrants("ana", "10.0.0.2")
      .exists(_.contains("'readers'")))
    Acl.clear()
  }

  test("guardedRead: denied throws, granted returns identical rows") {
    Acl.clear()
    Acl.grant("ok", Seq("SELECT"), db = "graft", tbl = "customer")
    intercept[SecurityException] {
      Acl.guardedRead("nobody", "%", "graft", "customer")(t.customer)
    }
    val guarded = Acl.guardedRead("ok", "%", "graft", "customer")(t.customer)
      .orderBy("c_custkey").collect()
    val plain = t.customer.orderBy("c_custkey").collect()
    assert(guarded.sameElements(plain))
    Acl.clear()
  }

  test("revoke closes the enforcement gate it opened") {
    Acl.clear()
    Acl.grant("tmp", Seq("SELECT"), db = "graft", tbl = "customer")
    assert(Acl.verify("tmp", "%", "graft", "customer", "SELECT"))
    Acl.revoke("tmp", Seq("SELECT"), db = "graft", tbl = "customer")
    assert(!Acl.verify("tmp", "%", "graft", "customer", "SELECT"))
    intercept[SecurityException] {
      Acl.guardedRead("tmp", "%", "graft", "customer")(t.customer)
    }
    Acl.clear()
  }
}
