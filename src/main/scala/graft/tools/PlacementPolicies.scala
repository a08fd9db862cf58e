package graft.tools

import scala.collection.mutable

/** Placement-policy catalog — the CREATE / ALTER / DROP PLACEMENT
  * POLICY lifecycle (reference: ddl/ddl_api.go:6611
  * CreatePlacementPolicy, AlterPlacementPolicy, DropPlacementPolicy;
  * parser/ast/ddl.go PlacementPolicy options PRIMARY_REGION /
  * REGIONS / FOLLOWERS). A policy is a named placement rule set;
  * tables ATTACH to a policy (`ALTER TABLE t PLACEMENT POLICY p`),
  * and dropping a policy still referenced by a table REFUSES — the
  * reference's ErrPlacementPolicyInUse — so data can never be left
  * pointing at a deleted rule set.
  *
  * The store is the metadata side only (a driver-side catalog, like
  * SessionManager / RowLocks): no multi-region scheduler exists
  * locally, so "placement" renders as SHOW PLACEMENT rows
  * ([[renderRows]]) that q_show_placement serves next to the engine's
  * real physical layouts — the q_placement_policy entry hash-pins the
  * render flips across the whole lifecycle.
  */
object PlacementPolicies {

  final case class Policy(primaryRegion: String, regions: Seq[String],
      followers: Int)

  // name -> policy; table -> attached policy name. Plain hash maps:
  // renderRows sorts by name, so iteration order never reaches the
  // rendered card.
  private val policies = mutable.Map.empty[String, Policy]
  private val attached = mutable.Map.empty[String, String]

  def clear(): Unit = synchronized { policies.clear(); attached.clear() }

  /** CREATE PLACEMENT POLICY — refuses a duplicate name (the
    * reference's ErrPlacementPolicyExists). */
  def create(name: String, p: Policy): Unit = synchronized {
    if (policies.contains(name)) throw new IllegalStateException(
      s"placement policy $name already exists")
    policies(name) = p
  }

  /** ALTER PLACEMENT POLICY — full-option replace; refuses an
    * unknown name. Attached tables see the new rules immediately
    * (they reference the policy BY NAME, exactly why in-use drop
    * must refuse). */
  def alter(name: String, p: Policy): Unit = synchronized {
    if (!policies.contains(name)) throw new IllegalStateException(
      s"placement policy $name does not exist")
    policies(name) = p
  }

  /** DROP PLACEMENT POLICY — refuses while any table is attached
    * (ErrPlacementPolicyInUse names the blocking table). */
  def drop(name: String): Unit = synchronized {
    if (!policies.contains(name)) throw new IllegalStateException(
      s"placement policy $name does not exist")
    val users = attached.collect { case (tbl, p) if p == name => tbl }
    if (users.nonEmpty) throw new IllegalStateException(
      s"placement policy $name is in use by table(s) " +
        users.toSeq.sorted.mkString(", "))
    policies.remove(name); ()
  }

  /** ALTER TABLE tbl PLACEMENT POLICY name — refuses an unknown
    * policy (a table cannot point at rules that do not exist). */
  def attach(table: String, name: String): Unit = synchronized {
    if (!policies.contains(name)) throw new IllegalStateException(
      s"placement policy $name does not exist")
    attached(table) = name
  }

  /** ALTER TABLE tbl PLACEMENT POLICY DEFAULT — detach. */
  def detach(table: String): Unit = synchronized {
    attached.remove(table); ()
  }

  /** SHOW PLACEMENT rows for the policy catalog: one row per policy
    * (`POLICY name` / its option string / SCHEDULED) then one per
    * attachment (`TABLE tbl` / `PLACEMENT POLICY name` / SCHEDULED),
    * each group name-ordered — the deterministic render
    * q_show_placement serves BEFORE its physical-layout rows
    * (show_placement.go lists policies first). */
  def renderRows(): Seq[(String, String, String)] = synchronized {
    val ps = policies.toSeq.sortBy(_._1).map { case (n, p) =>
      (s"POLICY $n",
        s"""PRIMARY_REGION="${p.primaryRegion}" """ +
          s"""REGIONS="${p.regions.mkString(",")}" """ +
          s"FOLLOWERS=${p.followers}",
        "SCHEDULED")
    }
    val as = attached.toSeq.sortBy(_._1).map { case (tbl, n) =>
      (s"TABLE $tbl", s"PLACEMENT POLICY $n", "SCHEDULED")
    }
    ps ++ as
  }
}
