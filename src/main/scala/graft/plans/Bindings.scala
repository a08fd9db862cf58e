package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL plan bindings (reference: executor/bind.go SQLBindExec +
  * bindinfo/ — `CREATE BINDING FOR <stmt> USING <hinted stmt>`: when
  * an incoming statement matches a stored binding's normalized
  * digest, the engine executes the HINTED text instead, steering the
  * plan of a misbehaving query in production WITHOUT touching
  * application SQL — the plan-management escape hatch next to the
  * optimizer rule blacklist).
  *
  * Spark realization: normalization is lowercase + whitespace
  * collapse (the bindinfo.NormalizeSQL analog — TiDB also strips
  * literals for fuzzy bindings; exact-statement bindings are the
  * core contract and what this models). The store maps the
  * normalized digest to the hinted text; [[run]] executes the bound
  * text when a binding matches and the original otherwise. Hints
  * ride Spark's native hint comments (MERGE, BROADCAST,
  * SHUFFLE_HASH, REPARTITION, …), so the steering
  * power is exactly Catalyst's hint set — and like the reference,
  * [[create]] REJECTS a binding whose statement differs from the
  * bound query by anything other than hints (a binding must never be
  * able to change semantics, only plans).
  */
object Bindings {
  private val store =
    new scala.collection.concurrent.TrieMap[String, String]()

  /** bindinfo.NormalizeSQL analog: case- and whitespace-insensitive
    * statement identity OUTSIDE string literals — quoted spans are
    * preserved verbatim (case, spacing, everything), because two
    * statements differing in a literal are DIFFERENT statements and
    * matching them would let a binding change answers. Backtick-
    * quoted identifiers are preserved verbatim the same way (no case
    * fold, no collapse) — conservative: spell-variant identifiers
    * are treated as different statements. Handles backslash escapes
    * inside string literals (backslash is not an escape inside
    * backticks); SQL-standard doubled-quote escaping preserves text
    * by construction (close + reopen). */
  def normalize(sql: String): String = {
    val sb = new StringBuilder
    var quote: Char = 0
    var pendingWs = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) {
        sb.append(c)
        if (c == '\\' && quote != '`' && i + 1 < sql.length) {
          sb.append(sql.charAt(i + 1)); i += 1
        } else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"' || c == '`') {
        if (pendingWs && sb.nonEmpty) sb.append(' ')
        pendingWs = false
        quote = c
        sb.append(c)
      } else if (c.isWhitespace) {
        pendingWs = true
      } else {
        if (pendingWs && sb.nonEmpty) sb.append(' ')
        pendingWs = false
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    sb.toString
  }

  // Quote-aware walk, not a regex: a '/*+' or '*/' INSIDE a string
  // literal is data, and a regex that can open in one literal and
  // close in another would delete real SQL between them and
  // spuriously reject the binding. Outside quotes the comment closes
  // at the first '*/' (so hint bodies may contain '*'); an unclosed
  // hint passes through verbatim and fails the identity check
  // honestly.
  private def stripHints(sql: String): String = {
    val sb = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) {
        sb.append(c)
        if (c == '\\' && quote != '`' && i + 1 < sql.length) {
          sb.append(sql.charAt(i + 1)); i += 1
        } else if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; sb.append(c); i += 1
      } else if (c == '/' && i + 2 < sql.length &&
          sql.charAt(i + 1) == '*' && sql.charAt(i + 2) == '+') {
        val end = sql.indexOf("*/", i + 3)
        if (end < 0) { sb.append(sql.substring(i)); i = sql.length }
        else { sb.append(' '); i = end + 2 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Install a binding. Throws if the USING statement is not the
    * bound statement modulo hint comments — the reference's
    * same-statement check (bind.go matches the two ASTs). */
  def create(forSql: String, usingSql: String): Unit = {
    require(normalize(stripHints(usingSql)) == normalize(forSql),
      "binding USING statement must equal the bound statement " +
        "modulo /*+ ... */ hints")
    store(normalize(forSql)) = usingSql
  }

  def drop(forSql: String): Unit = store.remove(normalize(forSql))

  def isBound(sql: String): Boolean = store.contains(normalize(sql))

  /** The hinted text a digest is bound to, if any. */
  def bound(sql: String): Option[String] = store.get(normalize(sql))

  /** Execute `sql`, substituting the bound hinted text when one
    * matches — the SQLBindExec dispatch. */
  def run(spark: SparkSession, sql: String): DataFrame =
    spark.sql(store.getOrElse(normalize(sql), sql))

  // ---- baseline capture (bindinfo/handle.go CaptureBaselines) ----

  /** Capture frequency floor — the reference's default: a digest
    * executed twice is workload, not a one-off. */
  val CaptureThreshold = 2

  /** Bound on tracked digests. normalize() keeps literals, so a
    * parameterized workload mints a distinct digest per literal; an
    * unbounded counter map would grow with the life of the JVM. The
    * reference's capture likewise rides a BOUNDED statement-summary
    * ring. Overflow resets the counters — capture is best-effort
    * frequency sampling, and a hot statement re-crosses the floor
    * within two executions of a reset. */
  val MaxTrackedDigests = 65536

  private val execCounts =
    new scala.collection.concurrent.TrieMap[String, Int]()

  def clearCapture(): Unit = execCounts.clear()

  /** Execute `sql` through the binding dispatch and, when its digest
    * has no binding yet and has now run [[CaptureThreshold]] times,
    * AUTO-CREATE a baseline from the execution — the
    * bindinfo/handle.go capture path: the FINAL adaptive plan's join
    * strategies are rendered back onto the statement as hints
    * (BROADCAST / MERGE / SHUFFLE_HASH on each join's right-side
    * relation name from the analyzed plan), freezing today's plan
    * choice against tomorrow's optimizer/stats drift. The captured
    * text goes through [[create]], so the same-statement safety gate
    * applies — capture can only add hints, never change semantics.
    * Returns the collected rows: capture rides a REAL execution, so
    * the plan inspected is the plan that ran. Capture is
    * deliberately NARROW — only statements that BEGIN with SELECT
    * (hint placement after the leading keyword is unambiguous; a
    * WITH statement's first inner SELECT is the wrong scope) and
    * whose plan has exactly ONE hintable join (matching a physical
    * strategy list to logical join sides by traversal position is
    * only sound when both lists have one element — a nested-join
    * statement could otherwise capture MERGE(b) against the wrong
    * join). Everything else is left uncaptured rather than
    * mis-steered. */
  def capturedRun(spark: SparkSession,
      sql: String): Array[org.apache.spark.sql.Row] = {
    val df = run(spark, sql)
    val rows = df.collect()
    val digest = normalize(sql)
    if (!store.contains(digest) && digest.startsWith("select")) {
      if (execCounts.size >= MaxTrackedDigests) execCounts.clear()
      val n = execCounts.updateWith(digest)(
        c => Some(c.getOrElse(0) + 1)).get
      if (n >= CaptureThreshold)
        captureHints(df).foreach(h => create(sql, injectHints(sql, h)))
    }
    rows
  }

  /** The executed plan's join strategy paired with the analyzed
    * plan's right-side relation alias, rendered as a hint. None
    * unless the statement has EXACTLY ONE join on both the physical
    * and logical side with a named right-side relation: position-
    * based pairing is only sound for a single join (in a nested
    * join, collectFirst on the outer join's right subtree can name a
    * leaf of the INNER join, capturing the outer strategy against
    * the wrong relation) — a capture that guesses would steer the
    * wrong join. */
  private def captureHints(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, SubqueryAlias}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins._
    // Descend through AQE wrappers and materialized stages — the
    // Trace walk — so the strategies seen are the ones that ran.
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case o                        => o.children
    }).flatMap(walk)
    val phys = walk(df.queryExecution.executedPlan).collect {
      case _: BroadcastHashJoinExec => "BROADCAST"
      case _: SortMergeJoinExec     => "MERGE"
      case _: ShuffledHashJoinExec  => "SHUFFLE_HASH"
    }
    val names = df.queryExecution.analyzed.collect {
      case j: Join =>
        j.right.collectFirst { case s: SubqueryAlias => s.alias }
    }
    (phys, names) match {
      case (Seq(strategy), Seq(Some(name))) => Some(s"$strategy($name)")
      case _ => None
    }
  }

  /** Insert the captured hint block after the statement's LEADING
    * SELECT keyword. capturedRun gates on the normalized digest
    * starting with `select`, so the first occurrence in the raw text
    * is that leading keyword (not an identifier substring or a CTE's
    * inner SELECT). */
  private def injectHints(sql: String, hints: String): String = {
    val i = sql.toLowerCase(java.util.Locale.ROOT).indexOf("select")
    require(i >= 0, "capture requires a SELECT statement")
    val j = i + "select".length
    s"${sql.substring(0, j)} /*+ $hints */${sql.substring(j)}"
  }
}
