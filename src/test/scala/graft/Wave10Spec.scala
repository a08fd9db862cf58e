package graft

import org.apache.spark.sql.functions._

class Wave10Spec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  test("q_func_math2: identities and null-safe equality semantics") {
    val rows = q("q_func_math2").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // acos/asin land in their principal ranges.
      assert(r.getAs[Double]("v_acos") >= 0 &&
        r.getAs[Double]("v_acos") <= math.Pi + 1e-9)
      val as = r.getAs[Double]("v_asin")
      assert(as >= -math.Pi / 2 - 1e-9 && as <= math.Pi / 2 + 1e-9)
      assert(r.getAs[Double]("v_pi") == 3.141593)
      // TRUNCATE(x,2) never moves away from zero and drops <1 cent.
      val tr = r.getAs[Double]("v_trunc2")
      assert(math.abs(tr * 100 - math.rint(tr * 100)) < 1e-6)
    }
    // v_nulleq covers all three truth branches: equal (1), one-side
    // NULL (0), both NULL (1). qty=25 → both NULL; qty=30 → left NULL
    // only; others equal.
    val byQty = t.lineitem.filter(col("l_orderkey") < 400)
      .select(col("l_quantity")).distinct().collect().map(_.getDouble(0))
    assert(byQty.contains(25.0) && byQty.contains(30.0))
    val flags = q("q_func_math2").select("v_nulleq").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(flags == Set(0, 1))
  }

  test("q_agg_bitmap: bitmap counts equal exact COUNT(DISTINCT)") {
    val got = q("q_agg_bitmap").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_parts_all"))).toMap
    val exact = t.lineitem.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    val all = t.lineitem.select(countDistinct("l_partkey")).head.getLong(0)
    assert(got.keySet == exact.keySet)
    got.foreach { case (f, (n, nAll)) =>
      assert(n == exact(f)); assert(nAll == all)
    }
  }

  test("q_func_json5: every doc shape classifies and validates correctly") {
    val rows = q("q_func_json5").collect()
    assert(rows.length == 600)
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      (id % 5) match {
        case 0 =>
          assert(r.getAs[Int]("is_valid") == 1)
          assert(r.getAs[String]("jtype") == "object")
          assert(r.getAs[Int]("contains_pos") == 1)
          assert(r.getAs[Int]("contains_neg") == 0)
        case 1 => assert(r.getAs[String]("jtype") == "array")
        case 2 =>
          assert(r.getAs[String]("jtype") == "string")
          // JSON_UNQUOTE inverts the quoting of the raw doc.
          assert("\"" + r.getAs[String]("unquoted") + "\"" ==
            r.getAs[String]("doc"))
        case 3 => assert(r.getAs[String]("jtype") == "integer")
        case _ =>
          assert(r.getAs[Int]("is_valid") == 0)
          assert(r.getAs[String]("jtype") == null)
      }
      // JSON_QUOTE output is itself valid JSON that re-parses to the
      // original string (escape-correct round trip incl. " and \n).
      val quoted = r.getAs[String]("quoted")
      assert(quoted.startsWith("\"") && quoted.endsWith("\""))
      assert(quoted.contains("\\\"q\\n"))
    }
  }

  test("q_keyset_page: keyset page equals the OFFSET page it replaces") {
    val keyset = q("q_keyset_page").collect()
      .map(r => (r.getAs[Long]("o_orderkey")))
    val offset = t.orders
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .limit(60).collect().map(_.getAs[Long]("o_orderkey")).drop(40).take(20)
    assert(keyset.toSeq == offset.toSeq)
  }

  test("q_prepare: bound executions equal their literal-inlined twins") {
    val rows = q("q_prepare").collect()
    val lit1 = t.orders
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp") &&
        col("o_totalprice") > 150000)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got1 = rows.filter(_.getAs[Int]("exec_id") == 1)
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n")).toMap
    assert(got1 == lit1)
    // Two distinct parameter sets really produce distinct results.
    val got2 = rows.filter(_.getAs[Int]("exec_id") == 2)
    assert(got2.nonEmpty && got2.map(_.getAs[Long]("n")).sum !=
      got1.values.sum)
  }

  test("q_split_region: contiguous, balanced, complete key ranges") {
    val regions = q("q_split_region").collect()
      .map(r => (r.getAs[Int]("region_id"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))
      .sortBy(_._1)
    assert(regions.map(_._1).toSeq == (0 until 8))
    assert(regions.map(_._2).sum == t.orders.count())
    // Contiguous: each region's min is after the previous region's max.
    regions.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 > a._4)
    }
    // Balanced: octile split keeps every region within 2% of ideal.
    val ideal = t.orders.count() / 8.0
    regions.foreach(r => assert(math.abs(r._2 - ideal) / ideal < 0.02))
  }

  test("q_join_naaj: null member empties the arm; plan is null-aware") {
    val df = q("q_join_naaj")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // The nullable arm's count is zero on EVERY row: one NULL member
    // turns all its non-matches UNKNOWN.
    assert(rows.forall(_.getAs[Long]("n_null_arm") == 0L))
    // The clean arm is the plain complement of the inner key set.
    val inner = t.orders
      .filter(col("o_custkey").between(50, 150))
      .select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val expect = t.customer.filter(col("c_custkey") < 200)
      .select("c_custkey").collect().map(_.getLong(0))
      .filterNot(inner.contains).toSet
    assert(rows.map(_.getAs[Long]("c_custkey")).toSet == expect)
    // Both arms plan as broadcast HASH anti joins (the nullable one
    // carries Spark's null-aware flag internally — rendered with
    // "Join condition: None" in formatted mode — never a naive
    // nested-loop or a semantics-losing plain anti join, which the
    // n_null_arm=0 assertion above would catch as nonzero).
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("BroadcastHashJoin LeftAnti".r.findAllIn(plan).size >= 2,
      s"expected two broadcast anti joins in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_schema_evolution: pre-evolution rows answer with the default") {
    val rows = q("q_schema_evolution").collect()
    assert(rows.length ==
      t.orders.filter(col("o_orderkey") < 600).count())
    rows.foreach { r =>
      if (r.getAs[Long]("o_orderkey") < 300) {
        assert(r.getAs[String]("priority") == "LEGACY")
        assert(r.getAs[Int]("post_evolution") == 0)
      } else {
        assert(r.getAs[String]("priority") != "LEGACY")
        assert(r.getAs[Int]("post_evolution") == 1)
      }
    }
  }

  test("q_merge_into: all three arms route correctly in one pass") {
    val rows = q("q_merge_into").collect()
    val byAction = rows.groupBy(_.getAs[String]("merge_action"))
      .map { case (k, v) => k -> v.length }
    val nOrders = t.orders.count()
    val nDel = t.orders.filter(col("o_orderkey") % 97 === 0).count()
    val nUpd = t.orders.filter(col("o_orderkey") % 7 === 0 &&
      col("o_orderkey") % 97 =!= 0).count()
    assert(byAction("inserted") == 50)
    assert(byAction("updated") == nUpd)
    assert(byAction("kept") == nOrders - nDel - nUpd)
    // Deleted keys are truly gone from the surviving base rows.
    assert(rows.filter(_.getAs[String]("merge_action") != "inserted")
      .forall(_.getAs[Long]("o_orderkey") % 97 != 0))
    val mx = t.orders.agg(max("o_orderkey")).head.getLong(0)
    assert(rows.filter(_.getAs[String]("merge_action") == "inserted")
      .forall(_.getAs[Long]("o_orderkey") > mx))
  }

  test("q_delete_limit: exactly the 100 oldest rows are gone") {
    val survivors = q("q_delete_limit").collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    val all = t.orders.select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    assert(survivors.size == all.size - 100)
    val oldest = t.orders
      .orderBy(col("o_orderdate"), col("o_orderkey")).limit(100)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert((all -- survivors) == oldest)
  }

  test("e_mad: flagged events really exceed 3 MADs from their median") {
    val rows = q("e_mad").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("value_r") - r.getAs[Double]("med_r"))
        > 3 * r.getAs[Double]("mad_r") - 1e-3)
    }
    // Spot-recompute one user end-to-end.
    val u = rows.head.getAs[Long]("user_id")
    val vals = t.events.filter(col("user_id") === u)
      .select("value").collect().map(_.getDouble(0)).sorted
    def medOf(a: Array[Double]): Double = {
      val n = a.length
      if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2
    }
    val med = medOf(vals)
    val mad = medOf(vals.map(v => math.abs(v - med)).sorted)
    val expect = vals.count(v => math.abs(v - med) > 3 * mad)
    assert(rows.count(_.getAs[Long]("user_id") == u) == expect)
  }

  test("e_window_topk: top-2 event types per hour, counts exact") {
    val rows = q("e_window_topk").collect()
    assert(rows.nonEmpty)
    val byW = rows.groupBy(_.getAs[java.sql.Timestamp]("w_start"))
    byW.values.foreach(g => assert(g.length <= 2))
    val counts = t.events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w"),
        col("event_type")).count()
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("w"),
        r.getAs[String]("event_type")) -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == counts(
        (r.getAs[java.sql.Timestamp]("w_start"),
          r.getAs[String]("event_type"))))
    }
  }

  test("q_func_info: cursor-state scalars are live values, not pins") {
    val r = q("q_func_info").head()
    assert(r.getAs[Long]("found_rows") ==
      t.customer.filter(col("c_acctbal") > 1000).count())
    assert(r.getAs[Long]("row_count_n") ==
      t.lineitem.filter(col("l_discount") > 0.05).count())
    assert(r.getAs[Long]("last_insert_id") ==
      t.orders.agg(max("o_orderkey")).head.getLong(0) + 1)
    val rows = q("q_func_info").collect()
    assert(rows.length == 25)
    rows.foreach(x =>
      assert(x.getAs[Long]("anyv") == x.getAs[Int]("c_nationkey") * 10L))
  }
}
