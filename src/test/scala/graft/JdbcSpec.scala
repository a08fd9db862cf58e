package graft

import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/** Federation: a dimension served from an embedded Derby database
  * joined against parquet facts in one logical plan, with the dim
  * predicate pushed into the JDBC scan.
  */
class JdbcSpec extends SparkSpecBase {

  private val url = "jdbc:derby:/tmp/graft_derby/dimdb;create=true"

  test("jdbc dim joins parquet facts and matches the parquet-only plan") {
    Jdbc.writeTable(t.nation, url, "nation_dim")
    val dbNation = Jdbc.readTable(spark, url, "nation_dim")
      .filter(col("n_regionkey") === 2)
    val viaDb = t.customer
      .join(broadcast(dbNation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_cust"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaParquet = t.customer
      .join(broadcast(t.nation.filter(col("n_regionkey") === 2)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_cust"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDb == viaParquet && viaDb.nonEmpty)
  }

  test("dim predicates push into the JDBC scan") {
    val plan = Jdbc.readTable(spark, url, "nation_dim")
      .filter(col("n_regionkey") === 2 && col("n_name").isNotNull)
      .select("n_nationkey", "n_name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), s"not a jdbc scan:\n$plan")
    assert(plan.contains("EqualTo(n_regionkey,2)"),
      s"filter not pushed to the database:\n$plan")
    // Column pruning reaches the database too: only the selected
    // columns appear in the JDBC read schema.
    assert(!plan.contains("n_regionkey:"),
      s"pruned column still read from the database:\n$plan")
  }
}
