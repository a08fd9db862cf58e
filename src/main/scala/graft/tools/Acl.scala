package graft.tools

import scala.collection.mutable

/** Session-registered ACL store + SHOW GRANTS renderer — the privilege
  * surface of the catalog family (reference: executor/show.go:1497
  * fetchShowGrants; privilege/privileges/cache.go:1170 showGrants does
  * the actual scope-by-scope render; executor/grant.go / revoke.go
  * mutate the store). The store is driver-sized by nature (principals
  * × grants — an admin card, not data), so it lives in plain JVM
  * state like [[UserVarsStore]]/[[StatementsSummary]]; queries over it
  * materialize tiny DataFrames.
  *
  * Rendering contract (cache.go:1170 + PrivToString at :1474):
  * one GRANT line per scope — global `*.*` first (with the MySQL
  * USAGE-fallback convention when the user exists but holds nothing),
  * then db scopes `db.*` sorted, then table scopes `db.tbl` sorted —
  * privileges listed in the canonical mysql.AllGlobalPrivs order,
  * `ALL PRIVILEGES` when the full scope mask is held, `WITH GRANT
  * OPTION` suffixed when GrantPriv is in the scope, and one
  * `GRANT 'role'@'%' TO 'user'@'host'` line per directly-held role.
  * Role privileges fold into the grantee's scopes via the TRANSITIVE
  * closure (FindAllUserEffectiveRoles), cycle-safe. */
object Acl {

  /** Canonical privilege order (parser/mysql/privs.go AllGlobalPrivs
    * prefix — the subset this card exercises). */
  private val PrivOrder = Seq("SELECT", "INSERT", "UPDATE", "DELETE",
    "CREATE", "DROP", "PROCESS", "REFERENCES", "ALTER", "EXECUTE",
    "INDEX", "CREATE VIEW", "SHOW VIEW", "CREATE ROLE", "DROP ROLE")

  private case class Key(user: String, host: String, db: String,
      tbl: String)

  private val privs = mutable.LinkedHashMap.empty[Key, mutable.Set[String]]
  private val grantOption = mutable.Set.empty[Key]
  private val users = mutable.LinkedHashSet.empty[(String, String)]
  // (role, grantee, granteeHost) — the grantee is identified by its
  // FULL user@host principal (host is part of identity everywhere
  // else in this store; NOTE the deliberate drift from MySQL's
  // wildcard host matching — a grant at host '%' is NOT honored for
  // the same user at a concrete host, hosts compare EXACTLY. This is
  // what q_priv_enforce's wrong-host denial pins, and it is stricter
  // than the reference's RequestVerification, never looser); roles
  // themselves live at host '%' by convention.
  private val roleEdges = mutable.LinkedHashSet.empty[(String, String, String)]
  // SET ROLE session state (executor/simple.go:154 SetRoleStmt, :158
  // SetDefaultRoleStmt): the per-principal ACTIVE role set, and the
  // stored DEFAULT set a login() activates. A principal absent from
  // activeRoles has activated NOTHING — the reference's session
  // default.
  private val activeRoles = mutable.Map.empty[(String, String), Set[String]]
  private val defaultRoles = mutable.Map.empty[(String, String), Set[String]]

  def clear(): Unit = synchronized {
    privs.clear(); grantOption.clear(); users.clear(); roleEdges.clear()
    activeRoles.clear(); defaultRoles.clear(); auth.clear()
  }

  /** CREATE USER / CREATE ROLE — registers the principal so SHOW
    * GRANTS renders the USAGE convention even with zero grants. */
  def createUser(user: String, host: String = "%"): Unit =
    synchronized { users += ((user, host)) }

  // (user, host) -> mysql_native_password authentication_string
  // (executor/simple.go executeCreateUser/executeAlterUser store the
  // parser/auth EncodePassword result into mysql.user).
  private val auth = mutable.LinkedHashMap.empty[(String, String), String]

  /** parser/auth EncodePassword: mysql_native_password's stored form
    * `'*' + HEX(SHA1(SHA1(password)))`. */
  def encodePassword(pw: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val twice = md.digest(md.digest(pw.getBytes("UTF-8")))
    "*" + twice.map(b => f"$b%02X").mkString
  }

  /** CREATE USER ... IDENTIFIED BY (executor/simple.go:137
    * executeCreateUser) — errors on a duplicate principal, exactly
    * like the statement without IF NOT EXISTS. */
  def createUser(user: String, host: String, password: String): Unit =
    synchronized {
      require(!users.contains((user, host)),
        s"Operation CREATE USER failed for '$user'@'$host'")
      users += ((user, host))
      auth((user, host)) = encodePassword(password)
    }

  /** ALTER USER ... IDENTIFIED BY (executor/simple.go:139
    * executeAlterUser) — replaces the stored auth string; the old
    * password stops verifying at that instant. */
  def alterUserPassword(user: String, host: String,
      password: String): Unit = synchronized {
    require(users.contains((user, host)),
      s"Operation ALTER USER failed for '$user'@'$host'")
    auth((user, host)) = encodePassword(password)
  }

  /** Authentication probe: does `pw` encode to the stored string?
    * (the CheckScrambledPassword outcome without the wire scramble —
    * an unregistered principal verifies nothing). */
  def checkPassword(user: String, host: String, pw: String): Boolean =
    synchronized {
      auth.get((user, host)).contains(encodePassword(pw))
    }

  /** The stored authentication_string, empty for password-less
    * principals (roles, bare createUser). */
  def authString(user: String, host: String): String = synchronized {
    auth.getOrElse((user, host), "")
  }

  /** DROP USER / DROP ROLE (executor/simple.go:141 executeDropUser):
    * removes the principal row AND every record keyed by it — its
    * privilege scopes, grant options, auth string, session role
    * state, role edges where it is the GRANTEE, and (when the
    * dropped principal is a role at the '%' convention host) edges
    * where it is the ROLE — the mysql.user/db/tables_priv/role_edges
    * cascade. */
  def dropUser(user: String, host: String = "%"): Unit = synchronized {
    require(users.contains((user, host)),
      s"Operation DROP USER failed for '$user'@'$host'")
    users -= ((user, host))
    privs.keys.filter(k => k.user == user && k.host == host)
      .toSeq.foreach(privs.remove)
    grantOption.filterInPlace(k => !(k.user == user && k.host == host))
    roleEdges.filterInPlace { case (r, u, h) =>
      !(u == user && h == host) && !(r == user && host == "%")
    }
    // Dropping a ROLE also scrubs its NAME from every principal's
    // active/default sets — otherwise a later re-created role of the
    // same name would silently resurrect privileges for grantees who
    // were never re-granted it (the revokeRole scrub, applied to the
    // stronger removal).
    if (host == "%") {
      activeRoles.mapValuesInPlace((_, s) => s - user)
      defaultRoles.mapValuesInPlace((_, s) => s - user)
    }
    auth -= ((user, host))
    activeRoles -= ((user, host))
    defaultRoles -= ((user, host))
  }

  /** RENAME USER old TO new [, old2 TO new2 ...] (reference:
    * executor/simple.go:1075 executeRenameUser): per pair, the old
    * principal must exist and the new must NOT — both checked
    * AGAINST THE STATE LEFT BY EARLIER PAIRS, exactly like the
    * reference's in-transaction sequential walk (so a chain
    * `a TO b, b TO c` behaves as the reference's txn does) — and a
    * failing pair rolls EVERY earlier pair back before throwing (the
    * reference breaks and rolls back the internal transaction;
    * MySQL-compat: the error names the failing pair). Every record
    * keyed by the principal moves: privileges, grant-option flags,
    * credentials, role edges (as grantee, and as the ROLE NAME for
    * '%-host' principals), and active/default role sets —
    * membership SETS also rewrite the role name, so a renamed role
    * keeps contributing to its grantees. */
  def renameUsers(
      pairs: Seq[((String, String), (String, String))]): Unit =
    synchronized {
      val done = mutable.Buffer.empty[((String, String), (String, String))]
      pairs.foreach { case pair @ ((ou, oh), (nu, nh)) =>
        def fail(why: String): Nothing = {
          done.reverseIterator.foreach { case ((u1, h1), (u2, h2)) =>
            applyRename(u2, h2, u1, h1) // inverse is always valid
          }
          throw new IllegalArgumentException(
            s"Operation RENAME USER failed for '$ou'@'$oh' TO " +
              s"'$nu'@'$nh' ($why)")
        }
        if (!users.contains((ou, oh))) fail("old did not exist")
        if (users.contains((nu, nh))) fail("new did exist")
        applyRename(ou, oh, nu, nh)
        done += pair
      }
    }

  def renameUser(oldUser: String, oldHost: String, newUser: String,
      newHost: String): Unit =
    renameUsers(Seq(((oldUser, oldHost), (newUser, newHost))))

  private def applyRename(ou: String, oh: String, nu: String,
      nh: String): Unit = {
    users -= ((ou, oh)); users += ((nu, nh))
    privs.keys.filter(k => k.user == ou && k.host == oh).toSeq
      .foreach { k =>
        val v = privs.remove(k).get
        privs(Key(nu, nh, k.db, k.tbl)) = v
      }
    grantOption.filter(k => k.user == ou && k.host == oh).toSeq
      .foreach { k =>
        grantOption -= k; grantOption += Key(nu, nh, k.db, k.tbl)
      }
    auth.remove((ou, oh)).foreach(a => auth((nu, nh)) = a)
    // Role edges: the grantee leg moves with the principal; the ROLE
    // NAME leg (identity at the '%' convention host) renames only
    // when both sides live there.
    val renamesRole = oh == "%" && nh == "%"
    val edges = roleEdges.toSeq
    roleEdges.clear()
    edges.foreach { case (r, u, h) =>
      val r2 = if (renamesRole && r == ou) nu else r
      val (u2, h2) = if (u == ou && h == oh) (nu, nh) else (u, h)
      roleEdges += ((r2, u2, h2))
    }
    Seq(activeRoles, defaultRoles).foreach { m =>
      m.remove((ou, oh)).foreach(s => m((nu, nh)) = s)
      if (renamesRole)
        m.mapValuesInPlace((_, s) =>
          if (s.contains(ou)) s - ou + nu else s)
    }
  }

  /** Does the principal hold `priv` WITH GRANT OPTION at a scope
    * covering db.tbl? Direct scopes only, through the grant-option
    * lattice — the executor/grant.go grantor check (MySQL's
    * "you need the GRANT OPTION to give what you hold"). */
  private def holdsWithGrantOption(user: String, host: String,
      db: String, tbl: String, priv: String): Boolean =
    Seq(Key(user, host, "*", "*"), Key(user, host, db, "*"),
      Key(user, host, db, tbl)).exists(k =>
      grantOption.contains(k) && privs.get(k).exists(_.contains(priv)))

  /** [[holdsWithGrantOption]] widened through the grantor's ACTIVE
    * role closure — MySQL's semantics: a grant option held by an
    * activated role delegates exactly like one held directly (the
    * reference's grant.go check runs RequestVerification with the
    * session's active roles). Role-held options live at the roles'
    * '%' convention host. */
  private def holdsWithGrantOptionThroughRoles(user: String,
      host: String, db: String, tbl: String, priv: String): Boolean =
    holdsWithGrantOption(user, host, db, tbl, priv) ||
      roleClosure(activeSet(user, host)).exists(r =>
        holdsWithGrantOption(r, "%", db, tbl, priv))

  /** GRANT executed AS a non-superuser grantor (reference:
    * executor/grant.go — the statement is privilege-checked before
    * any record is written: the grantor must hold EVERY granted
    * privilege WITH GRANT OPTION at a covering scope, else ERROR
    * 1044/1142 and NOTHING is granted). The plain [[grant]] stays
    * the bootstrap/superuser path.
    *
    * `honorActiveRoles = false` (the compat-pinned default the
    * existing grants hashes rely on) checks the grantor's DIRECT
    * scopes only; `true` is the MySQL semantics — options held
    * through the grantor's activated role closure delegate too,
    * mirroring the q_set_role activation contract. */
  def grantAs(grantorUser: String, grantorHost: String, user: String,
      privList: Seq[String], db: String = "*", tbl: String = "*",
      host: String = "%", withGrantOption: Boolean = false,
      honorActiveRoles: Boolean = false): Unit =
    synchronized {
      val expanded =
        if (privList.map(_.toUpperCase).contains("ALL")) PrivOrder
        else privList.map(_.toUpperCase)
      val missing = expanded.filterNot(p =>
        if (honorActiveRoles)
          holdsWithGrantOptionThroughRoles(grantorUser, grantorHost,
            db, tbl, p)
        else holdsWithGrantOption(grantorUser, grantorHost, db, tbl, p))
      require(missing.isEmpty,
        s"Access denied: '$grantorUser'@'$grantorHost' lacks GRANT " +
          s"OPTION for ${missing.mkString(", ")} on " +
          scopeSql(db, tbl))
      grant(user, expanded, db, tbl, host, withGrantOption)
    }

  /** REVOKE GRANT OPTION ON db.tbl FROM user@host — strips the
    * option flag only; the privileges themselves stay held. */
  def revokeGrantOption(user: String, db: String = "*",
      tbl: String = "*", host: String = "%"): Unit = synchronized {
    grantOption -= Key(user, host, db, tbl)
  }

  /** REVOKE 'role' FROM user@host (executor/simple.go
    * executeRevokeRole): drops the inheritance edge and scrubs the
    * role from the grantee's ACTIVE and DEFAULT sets — a revoked
    * role must stop contributing immediately, even mid-session. */
  def revokeRole(role: String, user: String, host: String = "%"): Unit =
    synchronized {
      roleEdges -= ((role, user, host))
      activeRoles.get((user, host)).foreach(s =>
        activeRoles((user, host)) = s - role)
      defaultRoles.get((user, host)).foreach(s =>
        defaultRoles((user, host)) = s - role)
    }

  /** GRANT privs ON db.tbl TO user@host (executor/grant.go). Scope:
    * db="*" → global; tbl="*" → whole-db. "ALL" expands to the
    * canonical order list. */
  def grant(user: String, privList: Seq[String], db: String = "*",
      tbl: String = "*", host: String = "%",
      withGrantOption: Boolean = false): Unit = synchronized {
    users += ((user, host))
    val k = Key(user, host, db, tbl)
    val expanded =
      if (privList.map(_.toUpperCase).contains("ALL")) PrivOrder
      else privList.map(_.toUpperCase)
    privs.getOrElseUpdate(k, mutable.Set.empty) ++= expanded
    if (withGrantOption) grantOption += k
  }

  /** REVOKE privs ON db.tbl FROM user@host (executor/revoke.go) —
    * removes from the exact scope; an emptied scope disappears from
    * the render (back to USAGE if nothing else is held). */
  def revoke(user: String, privList: Seq[String], db: String = "*",
      tbl: String = "*", host: String = "%"): Unit = synchronized {
    val k = Key(user, host, db, tbl)
    privs.get(k).foreach { s =>
      if (privList.map(_.toUpperCase).contains("ALL")) s.clear()
      else s --= privList.map(_.toUpperCase)
      if (s.isEmpty) { privs.remove(k); grantOption -= k }
    }
  }

  /** GRANT 'role' TO 'user'@'host' — a role-inheritance edge keyed by
    * the grantee's FULL principal (host included: a role granted to
    * 'u'@'10.0.0.1' must NOT fold into 'u'@'%'). Roles live at host
    * '%' by convention, and a grantee named only here gets the same
    * default. */
  def grantRole(role: String, user: String, host: String = "%"): Unit =
    synchronized {
      users += ((role, "%"))
      users += ((user, host))
      roleEdges += ((role, user, host))
    }

  /** Roles granted DIRECTLY to a principal (one role-edge hop). */
  private def directRoles(user: String, host: String): Set[String] =
    roleEdges.collect {
      case (r, u, h) if u == user && h == host => r
    }.toSet

  /** Cycle-safe transitive closure from a seed role set through the
    * role-to-role edges (which live at the '%' convention host) —
    * the BFS core shared by the fold-all default and the SET ROLE
    * activation path (activating a role activates everything it
    * inherits, exactly like FindAllUserEffectiveRoles from an
    * explicit active set). */
  private def roleClosure(seed: Set[String]): Set[String] = {
    val seen = mutable.Set.empty[String]
    var frontier = seed
    while (frontier.nonEmpty) {
      seen ++= frontier
      frontier = frontier.flatMap(m =>
        roleEdges.collect { case (r, u, h) if u == m && h == "%" => r }) -- seen
    }
    seen.toSet
  }

  /** Transitive role closure for a grantee principal
    * (FindAllUserEffectiveRoles) — cycle-safe BFS over role edges.
    * The first hop matches the grantee's (user, host) identity. */
  private def effectiveRoles(user: String, host: String): Set[String] =
    roleClosure(directRoles(user, host))

  /** SET ROLE r1, r2, … (executor/simple.go:154 SetRoleStmt):
    * activates EXACTLY the named roles for the principal's session.
    * Every named role must be directly granted — the reference
    * raises ErrRoleNotGranted (3530) otherwise, and so does this. */
  def setRole(user: String, host: String, roles: Seq[String]): Unit =
    synchronized {
      val granted = directRoles(user, host)
      val missing = roles.filterNot(granted.contains)
      require(missing.isEmpty,
        s"role ${missing.mkString(", ")} has not been granted to " +
          s"'$user'@'$host'")
      activeRoles((user, host)) = roles.toSet
    }

  /** SET ROLE ALL — activate every directly granted role. */
  def setRoleAll(user: String, host: String): Unit = synchronized {
    activeRoles((user, host)) = directRoles(user, host)
  }

  /** SET ROLE NONE — deactivate everything. */
  def setRoleNone(user: String, host: String): Unit = synchronized {
    activeRoles((user, host)) = Set.empty
  }

  /** SET DEFAULT ROLE r1, … TO user@host (executor/simple.go:158
    * SetDefaultRoleStmt): stores the set a future [[login]]
    * activates; does NOT touch the current session's active set
    * (the reference's semantics — defaults apply at authentication).
    * Named roles must be granted, same as [[setRole]]. */
  def setDefaultRole(user: String, host: String,
      roles: Seq[String]): Unit = synchronized {
    val granted = directRoles(user, host)
    val missing = roles.filterNot(granted.contains)
    require(missing.isEmpty,
      s"role ${missing.mkString(", ")} has not been granted to " +
        s"'$user'@'$host'")
    defaultRoles((user, host)) = roles.toSet
  }

  /** Session start for a principal: activates its stored DEFAULT
    * roles — or NOTHING when none were set, which is the reference's
    * activate-none login default (privilege/privileges role
    * activation). */
  def login(user: String, host: String): Unit = synchronized {
    activeRoles((user, host)) =
      defaultRoles.getOrElse((user, host), Set.empty)
  }

  /** The principal's currently ACTIVE roles (post-closure seed):
    * empty when no SET ROLE / login ever ran — TiDB's session
    * default. */
  private def activeSet(user: String, host: String): Set[String] =
    activeRoles.getOrElse((user, host), Set.empty)

  private def renderPrivs(ps: Set[String]): String =
    if (PrivOrder.forall(ps.contains)) "ALL PRIVILEGES"
    else PrivOrder.filter(ps.contains).mkString(",")

  private def scopeSql(db: String, tbl: String): String =
    if (db == "*") "*.*" else if (tbl == "*") s"$db.*" else s"$db.$tbl"

  /** SHOW GRANTS FOR user@host — the rendered statement list, in the
    * reference's order: global, db (sorted), table (sorted), then the
    * directly-held role lines.
    *
    * DIVERGENCE (deliberate, compat-pinned): this default folds ALL
    * granted roles into the scopes — the reference folds only the
    * session's ACTIVE roles, and a fresh TiDB session has activated
    * NONE. The fold-all default is what every existing grants/verify
    * hash pins; the activation-honoring semantics are the
    * `honorActiveRoles = true` overload. */
  def showGrants(user: String, host: String = "%"): Seq[String] =
    showGrants(user, host, honorActiveRoles = false)

  /** SHOW GRANTS honoring SET ROLE state: with `honorActiveRoles`
    * true only the closure of the session's ACTIVE roles folds into
    * the rendered scopes (the reference's actual semantics); false
    * is the fold-all compat default above. Role lines render either
    * way — role GRANTS are identity facts, activation only gates
    * their privilege folding. */
  def showGrants(user: String, host: String,
      honorActiveRoles: Boolean): Seq[String] =
    synchronized {
      if (!users.contains((user, host))) return Seq.empty
      val folded =
        if (honorActiveRoles) roleClosure(activeSet(user, host))
        else effectiveRoles(user, host)
      val sources = (user, host) +: folded.toSeq.sorted
        .map(r => (r, "%"))
      // Fold each source principal's grants into per-scope sets.
      val byScope = mutable.LinkedHashMap.empty[(String, String),
        (mutable.Set[String], Array[Boolean])]
      for ((su, sh) <- sources; (k, ps) <- privs
           if k.user == su && k.host == sh) {
        val slot = byScope.getOrElseUpdate((k.db, k.tbl),
          (mutable.Set.empty[String], Array(false)))
        slot._1 ++= ps
        if (grantOption.contains(k)) slot._2(0) = true
      }
      def line(db: String, tbl: String, ps: Set[String],
          go: Boolean): String = {
        val suffix = if (go) " WITH GRANT OPTION" else ""
        s"GRANT ${renderPrivs(ps)} ON ${scopeSql(db, tbl)} " +
          s"TO '$user'@'$host'$suffix"
      }
      val global = byScope.get(("*", "*"))
        .map { case (ps, go) => line("*", "*", ps.toSet, go(0)) }
      val dbLines = byScope.collect {
        case ((db, "*"), (ps, go)) if db != "*" =>
          (db, line(db, "*", ps.toSet, go(0)))
      }.toSeq.sortBy(_._1).map(_._2)
      val tblLines = byScope.collect {
        case ((db, tbl), (ps, go)) if db != "*" && tbl != "*" =>
          ((db, tbl), line(db, tbl, ps.toSet, go(0)))
      }.toSeq.sortBy(_._1).map(_._2)
      val roleLines = roleEdges.collect {
        case (r, u, h) if u == user && h == host =>
          s"GRANT '$r'@'%' TO '$user'@'$host'"
      }.toSeq.sorted
      val scoped = global.toSeq ++ dbLines ++ tblLines
      // MySQL convention: a known principal with zero rendered scopes
      // still answers with a USAGE line (cache.go:1218).
      val withUsage =
        if (scoped.isEmpty) Seq(s"GRANT USAGE ON *.* TO '$user'@'$host'")
        else scoped
      withUsage ++ roleLines
    }

  /** RequestVerification analog (privilege/privileges/privileges.go:
    * 111 — every executor calls it before touching a table): does
    * user@host hold `priv` on db.tbl, directly or through the
    * transitive role closure, at ANY covering scope — global `*.*`,
    * whole-db `db.*`, or the exact table? This is the same closure
    * and the same scope lattice SHOW GRANTS renders; enforcement and
    * display cannot drift. */
  def verify(user: String, host: String, db: String, tbl: String,
      priv: String): Boolean =
    verify(user, host, db, tbl, priv, honorActiveRoles = false)

  /** RequestVerification honoring SET ROLE activation: privileges
    * held directly always count; role-inherited privileges count
    * only through the closure of the ACTIVE role set (empty until
    * SET ROLE / [[login]] — the reference's activate-none session
    * default). The 5-arg form above stays fold-all — a deliberate,
    * compat-pinned divergence (every existing grants/verify hash
    * assumes it); host matching is EXACT on both forms (see the
    * [[roleEdges]] note). */
  def verify(user: String, host: String, db: String, tbl: String,
      priv: String, honorActiveRoles: Boolean): Boolean = synchronized {
    val p = priv.toUpperCase
    val folded =
      if (honorActiveRoles) roleClosure(activeSet(user, host))
      else effectiveRoles(user, host)
    val sources = (user, host) +: folded.toSeq.map(r => (r, "%"))
    val scopes = Seq(("*", "*"), (db, "*"), (db, tbl))
    sources.exists { case (su, sh) =>
      scopes.exists { case (sd, st) =>
        privs.get(Key(su, sh, sd, st)).exists(_.contains(p))
      }
    }
  }

  /** The guarded read path: a SELECT that passes RequestVerification
    * returns the UNALTERED reader (identical rows/plan to the
    * unguarded read — the check is plan-time, free at scale); a
    * denied principal throws the reference's ErrTableaccessDenied
    * shape (errno 1142) instead of returning rows. */
  def guardedRead[A](user: String, host: String, db: String,
      tbl: String)(read: => A): A = {
    if (!verify(user, host, db, tbl, "SELECT"))
      throw new SecurityException(
        s"SELECT command denied to user '$user'@'$host' for table '$db'.'$tbl'")
    read
  }
}
