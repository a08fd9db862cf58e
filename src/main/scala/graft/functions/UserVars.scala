package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Session-scoped user variables — the @var surface (reference:
  * expression/builtin_other.go:697 setVarFunctionClass, :880
  * BuildGetVarFunction; the store is sessionVars.Users, a per-session
  * map the executor mutates under UsersLock).
  *
  * Spark restatement: the reference evaluates SET_VAR per ROW in
  * execution order — per-row mutable session state is exactly what a
  * distributed plan cannot promise (rows evaluate on 1000 executors
  * in shuffle order), which is why MySQL 8 deprecated the
  * `@rn := @rn + 1` idiom in favor of window functions. So the
  * contract split here mirrors that deprecation:
  *  - STATEMENT-level assign-then-read (SET @cut = (scalar); later
  *    statements read @cut) keeps true session-store semantics: the
  *    scalar materializes once into this per-session map and later
  *    plans inline it as a literal — the same "datum in session
  *    memory" the reference stores.
  *  - PER-ROW running state (@rn, @prev) is stated as its window
  *    equivalent by the caller (see q_func_uservar).
  *
  * Names are case-insensitive (builtin_other.go:757 lowercases before
  * the store); reading an unset variable yields NULL (MySQL's GET of
  * an undefined @var). The store is keyed WEAKLY by SparkSession so
  * variables die with their session, like the reference's
  * sessionVars.
  */
object UserVars {

  private val stores = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Any]]())

  private def store(spark: SparkSession) =
    // computeIfAbsent on the synchronized wrapper holds its lock once
    // for the whole check-then-insert.
    stores.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty[String, Any])

  /** SET @name := value; returns the value (SET_VAR's return). */
  def set(spark: SparkSession, name: String, value: Any): Any = {
    store(spark).put(name.toLowerCase, value)
    value
  }

  /** SET @name := (scalar subquery) — materializes a 1-row/1-col
    * aggregate into the session store. The head() here IS the
    * semantics: a session variable is a scalar in session memory, so
    * the collect is O(1) by construction. */
  def assignScalar(spark: SparkSession, name: String, scalar: DataFrame): Any =
    set(spark, name, scalar.head().get(0))

  /** GET @name — None when unset. */
  def get(spark: SparkSession, name: String): Option[Any] =
    store(spark).get(name.toLowerCase)

  /** GET @name as a Column literal for use inside a later plan —
    * NULL when unset, matching MySQL's undefined-@var read. */
  def read(spark: SparkSession, name: String): Column =
    lit(get(spark, name).orNull)

  /** Drop every variable of the session (RESET-style; test hook). */
  def clear(spark: SparkSession): Unit = store(spark).clear()
}
