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

  test("q_agg_approxpct estimates within 1% of exact percentiles") {
    import org.apache.spark.sql.functions._
    val rows = Registry.all.find(_.name == "q_agg_approxpct").get.run(t)
      .collect()
    val exact = t.lineitem.groupBy("l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.95)").as("p95"),
      expr("percentile(l_extendedprice, 0.99)").as("p99"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    rows.foreach { r =>
      val (p50, p95, p99) = exact(r.getAs[String]("l_returnflag"))
      for ((est, ex) <- Seq(r.getAs[Double]("ap50") -> p50,
          r.getAs[Double]("ap95") -> p95, r.getAs[Double]("ap99") -> p99))
        assert(math.abs(est - ex) / ex < 0.01, s"approx $est vs exact $ex")
    }
  }

  test("q_agg_histogram buckets cover all rows exactly once") {
    val rows = Registry.all.find(_.name == "q_agg_histogram").get.run(t)
      .collect()
    val widthN = rows.filter(_.getAs[String]("kind") == "width")
      .map(_.getAs[Long]("n")).sum
    assert(widthN == t.lineitem.count(),
      "width buckets must partition the table")
    val depth = rows.filter(_.getAs[String]("kind") == "depth")
    assert(depth.length == 10)
    // Equi-depth: bucket sizes differ by at most one row.
    val sizes = depth.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1, s"not equi-depth: ${sizes.toSeq}")
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
