package graft

/** Smoke + semantics for every registry query at sf0.001. */
class RegistrySpec extends SparkSpecBase {

  test("registry names are unique and every oracle has a query") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs and returns a sane schema") {
      val df = q.run(t)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_agg_hash matches a hand-computed group") {
    val row = Registry.all.find(_.name == "q_agg_hash").get.run(t)
      .filter("l_returnflag = 'R' AND l_linestatus = 'F'")
      .collect().head
    assert(row.getAs[Long]("count_order") > 0)
    assert(row.getAs[Double]("avg_qty") > 0 &&
      row.getAs[Double]("avg_qty") <= 50)
  }

  test("q_agg_approx estimate within 5% of exact") {
    val rows = Registry.all.find(_.name == "q_agg_approx").get.run(t)
      .collect()
    val exact = t.lineitem.groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions
        .countDistinct("l_partkey").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val est = r.getAs[Long]("approx_parts").toDouble
      val ex = exact(r.getAs[String]("l_returnflag")).toDouble
      assert(math.abs(est - ex) / ex < 0.05,
        s"approx $est vs exact $ex")
    }
  }
}
