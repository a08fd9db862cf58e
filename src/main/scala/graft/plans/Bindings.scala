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

  /** Execute `sql`, substituting the bound hinted text when one
    * matches — the SQLBindExec dispatch. */
  def run(spark: SparkSession, sql: String): DataFrame =
    spark.sql(store.getOrElse(normalize(sql), sql))
}
