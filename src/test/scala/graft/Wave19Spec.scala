package graft

import graft.tools.{Acl, SessionManager => SM}
import org.apache.spark.sql.functions._

/** Round-15 SHOW-surface sweep: processlist + KILL, variables/status,
  * table status byte math, stats renders, regions, object DDL. */
class Wave19Spec extends SparkSpecBase {

  private def q(name: String) =
    Registry.all.find(_.name == name).get.run(t)

  // --- SHOW PROCESSLIST + KILL (show.go:388, simple.go:1455) ---

  test("processlist snapshot sees a GENUINELY concurrent statement " +
    "mid-flight, and it leaves after finishing") {
    SM.clear(); Acl.clear()
    Acl.grant("root", Seq("PROCESS"))
    val id = SM.connect("ana", "10.0.0.8:52100", "graft")
    val started = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var rows = -1L
    val worker = new Thread(() => {
      SM.begin(id, "SELECT COUNT(*) FROM orders")
      started.countDown()
      rows = t.orders.count() // a REAL concurrent Spark job
      done.await()            // hold the executing state for the snap
      SM.finish(id, 1L)
    })
    worker.start()
    assert(started.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // Mid-flight snapshot through the same store the render reads.
    val snap = SM.show("root", "%")
    assert(snap.exists(r => r._1 == id && r._6 == "executing" &&
      r._7.contains("SELECT COUNT(*) FROM orders")))
    done.countDown()
    worker.join(30000)
    assert(rows == t.orders.count())
    // Finished: back to Sleep with NULL info.
    val after = SM.show("root", "%").find(_._1 == id).get
    assert(after._5 == "Sleep" && after._7.isEmpty)
    SM.clear(); Acl.clear()
  }

  test("KILL cancels the victim's Spark job group: the victim " +
    "statement dies, the survivor completes") {
    SM.clear(); Acl.clear()
    val victim = SM.connect("ana", "10.0.0.8:52100", "graft")
    val survivor = SM.connect("bob", "10.0.0.9:52200", "graft")
    @volatile var victimErr: Throwable = null
    @volatile var victimRows = -1L
    val vThread = new Thread(() => {
      SM.begin(victim, "SELECT long_running")
      spark.sparkContext.setJobGroup(SM.jobGroup(victim),
        "SELECT long_running", interruptOnCancel = true)
      // sum(id % 7) cannot overflow (ANSI mode would turn an
      // overflow into a spurious non-cancellation error).
      try victimRows = spark.range(50000000000L)
        .selectExpr("sum(id % 7) s").collect().head.getLong(0)
      catch { case e: Throwable => victimErr = e }
      finally spark.sparkContext.clearJobGroup()
    })
    vThread.start()
    // Wait until the victim's job is REALLY active, then kill it.
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 30e9.toLong
    while (tracker.getJobIdsForGroup(SM.jobGroup(victim)).isEmpty &&
      System.nanoTime() < deadline) Thread.sleep(20)
    assert(tracker.getJobIdsForGroup(SM.jobGroup(victim)).nonEmpty,
      "victim job never started")
    assert(SM.kill(spark, victim))
    vThread.join(60000)
    assert(!vThread.isAlive, "victim thread did not die")
    assert(victimErr != null && victimRows == -1L,
      s"victim was not cancelled (rows=$victimRows)")
    // The survivor's statement on another connection completes.
    SM.begin(survivor, "SELECT COUNT(*) FROM nation")
    val n = t.nation.count()
    SM.finish(survivor, 1L)
    assert(n == 25L)
    // The victim is gone from the processlist; a dead connection
    // rejects further statements.
    assert(!SM.show("bob", "%").exists(_._1 == victim))
    intercept[IllegalArgumentException] { SM.begin(victim, "SELECT 1") }
    // KILL of an unknown id reports false, exactly like sm.Kill.
    assert(!SM.kill(spark, 9999L))
    SM.clear()
  }

  test("KILL QUERY cancels the statement but KEEPS the connection — " +
    "the same id accepts the next statement") {
    SM.clear()
    val id = SM.connect("ana", "10.0.0.8:52100", "graft")
    @volatile var err: Throwable = null
    @volatile var rows = -1L
    val th = new Thread(() => {
      SM.begin(id, "SELECT slow")
      spark.sparkContext.setJobGroup(SM.jobGroup(id), "SELECT slow",
        interruptOnCancel = true)
      try rows = spark.range(50000000000L)
        .selectExpr("sum(id % 7) s").collect().head.getLong(0)
      catch { case e: Throwable => err = e }
      finally spark.sparkContext.clearJobGroup()
    })
    th.start()
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 30e9.toLong
    while (tracker.getJobIdsForGroup(SM.jobGroup(id)).isEmpty &&
      System.nanoTime() < deadline) Thread.sleep(20)
    assert(SM.killQuery(spark, id))
    th.join(60000)
    assert(err != null && rows == -1L, "query was not cancelled")
    // The CONNECTION survived: still listed, next statement runs.
    assert(SM.show("ana", "%").exists(_._1 == id))
    SM.begin(id, "SELECT COUNT(*) FROM region")
    SM.finish(id, 1L)
    assert(t.region.count() == 5L)
    SM.clear()
  }

  test("FLUSH STATUS zeroes resettable counters; Connections and the " +
    "open-connection gauges survive") {
    SM.clear()
    val id = SM.connect("ana", "10.0.0.8:52100", "graft")
    SM.begin(id, "SELECT 1"); SM.finish(id, 1L)
    val before = SM.status().toMap
    assert(before("Com_select") == "1" && before("Rows_sent") == "1")
    SM.flushStatus()
    val after = SM.status().toMap
    assert(!after.contains("Com_select") ||
      after("Com_select") == "0")
    assert(after("Connections") == "1")
    assert(after("Threads_connected") == "1")
    SM.clear()
  }

  test("q_analyze_status: processed rows are the real pass sizes and " +
    "the failed leg is a real failure") {
    val rows = q("q_analyze_status").collect()
    val full = rows.find(r =>
      r.getAs[String]("table_name") == "orders" &&
      r.getAs[String]("job_info") == "analyze columns").get
    assert(full.getAs[Long]("processed_rows") == t.orders.count())
    val samp = rows.find(_.getAs[String]("job_info")
      .contains("samplerate")).get
    val n = samp.getAs[Long]("processed_rows")
    val fullN = t.orders.count()
    assert(n > 0 && n < fullN, s"sample $n of $fullN")
    val failed = rows.find(_.getAs[String]("state") == "failed").get
    assert(failed.getAs[Long]("processed_rows") == 0L)
  }

  test("q_stats_meta and q_stats_healthy agree through the shared " +
    "staged deltas, and the healthy corners hold") {
    val meta = q("q_stats_meta").collect().map(r =>
      r.getAs[String]("table_name") ->
        (r.getAs[Long]("modify_count"), r.getAs[Long]("row_count")))
      .toMap
    val healthy = q("q_stats_healthy").collect().map(r =>
      r.getAs[String]("table_name") -> r.getAs[Long]("healthy")).toMap
    assert(meta("customer")._1 == 0L && healthy("customer") == 100L)
    // modify >= count -> 0 (the reference's zero corner).
    assert(meta("nation")._1 >= meta("nation")._2 &&
      healthy("nation") == 0L)
    val (m, c) = meta("orders")
    assert(healthy("orders") ==
      math.floor((1.0 - m.toDouble / c) * 100).toLong)
    // The staged delta really is the three mutation-class counts.
    val expect = t.orders.filter(col("o_orderkey") % 29 === 3).count() +
      t.orders.filter(col("o_orderkey") % 13 === 4 &&
        col("o_orderkey") % 29 =!= 3).count() +
      t.orders.filter(col("o_orderkey") % 53 === 9).count()
    assert(m == expect)
  }

  test("q_processlist: privilege rule — root (PROCESS) sees all " +
    "three, ana sees only her own row") {
    val rows = q("q_processlist").collect()
    assert(rows.count(_.getAs[String]("stage") == "1_full_as_root") == 3)
    val own = rows.filter(_.getAs[String]("stage") == "2_own_as_ana")
    assert(own.length == 1 && own.head.getAs[String]("usr") == "ana")
    // Sleep rows render NULL info.
    val bob = rows.find(_.getAs[String]("usr") == "bob").get
    assert(bob.getAs[String]("command") == "Sleep" &&
      bob.isNullAt(bob.fieldIndex("info")))
  }

  test("SHOW PROCESSLIST (non-FULL) truncates Info to 100 chars — " +
    "the reference's %.100v") {
    SM.clear(); Acl.clear()
    Acl.grant("root", Seq("PROCESS"))
    val id = SM.connect("ana", "10.0.0.8:52100", "graft")
    val longSql = "SELECT " + ("o_orderkey, " * 20) + "1"
    assert(longSql.length > 100)
    SM.begin(id, longSql)
    val full = SM.show("root", "%", full = true).head._7.get
    val brief = SM.show("root", "%", full = false).head._7.get
    assert(full == longSql && brief == longSql.take(100))
    SM.finish(id); SM.clear(); Acl.clear()
  }

  // --- SHOW VARIABLES / STATUS (show.go:724 / :765) ---

  test("q_show_variables derives LIVE from the session — flipping a " +
    "conf flips the card") {
    val before = q("q_show_variables").collect()
      .map(r => r.getAs[String]("variable_name") ->
        r.getAs[String]("value")).toMap
    assert(before("time_zone") == "UTC")
    assert(before("adaptive_query_execution") == "ON")
    assert(before("sql_mode") == "STRICT_TRANS_TABLES,ANSI")
    assert(before("version_class") == spark.version.split('.')
      .take(2).mkString("."))
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val flipped = q("q_show_variables").collect()
        .map(r => r.getAs[String]("variable_name") ->
          r.getAs[String]("value")).toMap
      assert(flipped("adaptive_query_execution") == "OFF")
    } finally spark.conf.set(key, prev)
  }

  test("q_show_status counters tie to the pinned workload and the " +
    "live data") {
    val rows = q("q_show_status").collect()
      .map(r => r.getAs[String]("variable_name") ->
        r.getAs[String]("value")).toMap
    assert(rows("Com_select") == "3" && rows("Questions") == "4")
    assert(rows("Threads_connected") == "2" &&
      rows("Threads_running") == "1")
    val expectRows = 1L + t.region.count() +
      t.nation.filter(col("n_nationkey") < 10).count()
    assert(rows("Rows_sent") == expectRows.toString)
  }

  // --- SHOW TABLE STATUS (show.go:463) ---

  test("q_table_status: rows match real counts and the byte columns " +
    "obey the width arithmetic") {
    val rows = q("q_table_status").collect()
    assert(rows.map(_.getAs[String]("table_name")).sorted.toSeq ==
      graft.operators.Catalog.tables(t).map(_._1).sorted)
    val nation = rows.find(_.getAs[String]("table_name") == "nation").get
    assert(nation.getAs[Long]("table_rows") == 25L)
    // nation = int(4) + octet_length(n_name) + int(4): recompute.
    val expected = t.nation.select(
      (lit(8L) + octet_length(col("n_name")).cast("long")).as("w"))
      .agg(sum("w")).head().getLong(0)
    assert(nation.getAs[Long]("data_length") == expected)
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_row_length") ==
        r.getAs[Long]("data_length") / r.getAs[Long]("table_rows"))
    }
  }

  // --- SHOW STATS_BUCKETS / TOPN (show_stats.go:210 / :269) ---

  test("q_stats_buckets: cumulative count ends at the table size, " +
    "repeats count the upper-bound rows, buckets are contiguous") {
    val rows = q("q_stats_buckets").collect()
      .sortBy(_.getAs[Int]("bucket_id"))
    assert(rows.map(_.getAs[Int]("bucket_id")).toSeq ==
      rows.indices.toSeq)
    assert(rows.last.getAs[Long]("cum_count") == t.orders.count())
    // Bucket bounds are non-overlapping and ordered.
    val bounds = rows.map(r => (
      BigDecimal(r.getAs[String]("lower_bound")),
      BigDecimal(r.getAs[String]("upper_bound"))))
    bounds.foreach { case (lo, hi) => assert(lo <= hi) }
    bounds.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // Spot-check repeats on the first bucket: rows equal to its hi.
    val hi0 = rows.head.getAs[String]("upper_bound").toDouble
    val n0 = t.orders.filter(
      col("o_totalprice").cast("decimal(18,2)").cast("double") === hi0)
      .count()
    assert(rows.head.getAs[Long]("repeats") == n0)
  }

  test("q_stats_topn: values are the exact per-column counts in " +
    "deterministic rank order") {
    val rows = q("q_stats_topn").collect()
    val prio = rows.filter(
      _.getAs[String]("column_name") == "o_orderpriority")
    val exact = t.orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    prio.foreach(r =>
      assert(r.getAs[Long]("cnt") == exact(r.getAs[String]("value"))))
    // Top-5 over 5 distinct priorities = the complete exact counts.
    assert(prio.map(_.getAs[String]("value")).toSet == exact.keySet)
    val status = rows.filter(
      _.getAs[String]("column_name") == "o_orderstatus")
    assert(status.length == t.orders.select("o_orderstatus")
      .distinct().count())
  }

  // --- SHOW TABLE REGIONS (show.go:1731) ---

  test("q_table_regions: 8 contiguous regions keyed t_orders_r_*, " +
    "row counts sum to the table") {
    val rows = q("q_table_regions").collect()
      .sortBy(_.getAs[Int]("region_id"))
    assert(rows.length == 8)
    assert(rows.head.getAs[String]("start_key") == "t_orders_r")
    assert(rows.last.getAs[String]("end_key") == "t_orders_")
    // Interior keys chain: region i's end == region i+1's start.
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[String]("end_key") ==
        b.getAs[String]("start_key"))
      case _ =>
    }
    assert(rows.map(_.getAs[Long]("n_rows")).sum == t.orders.count())
  }

  test("q_index_advise: advice class restates the reference-count " +
    "dominance rule on every row") {
    q("q_index_advise").collect().foreach { r =>
      val (e, rg, j) = (r.getAs[Int]("eq_refs"),
        r.getAs[Int]("range_refs"), r.getAs[Int]("join_refs"))
      val expect =
        if (j >= math.max(e, rg) && j > 0) "BUCKET"
        else if (rg > e) "PARTITION_SORT"
        else if (e > 0) "CLUSTER"
        else "STATS_ONLY"
      assert(r.getAs[String]("advice") == expect, r.toString)
      assert(e + rg + j > 0, "unreferenced column in the card")
    }
  }

  // --- RENAME USER (simple.go:1075) / SHOW BACKUPS (show.go:221) ---

  test("renameUsers: chained pairs see earlier renames, rollback " +
    "restores every moved record, and a renamed ROLE keeps " +
    "contributing to its grantees") {
    Acl.clear()
    // A chain the reference's in-txn walk allows: a->b then the
    // freed name b... (a TO b, c TO a) — c takes a's just-freed name.
    Acl.createUser("a", "%", "pa")
    Acl.createUser("c", "%", "pc")
    Acl.renameUsers(Seq((("a", "%"), ("b", "%")), (("c", "%"), ("a", "%"))))
    assert(Acl.checkPassword("b", "%", "pa"))
    assert(Acl.checkPassword("a", "%", "pc"))
    // Renaming a ROLE rewrites the edge and member sets: grantees
    // keep inheriting under the new role name.
    Acl.grant("r_old", Seq("SELECT"), db = "graft", tbl = "customer")
    Acl.grantRole("r_old", "b")
    Acl.setRole("b", "%", Seq("r_old"))
    Acl.renameUser("r_old", "%", "r_new", "%")
    assert(Acl.verify("b", "%", "graft", "customer", "SELECT",
      honorActiveRoles = true))
    assert(Acl.showGrants("b", "%").exists(_.contains("r_new")))
    // Rollback: second pair fails, the first pair's rename undoes —
    // including privileges and the role edge.
    intercept[IllegalArgumentException] {
      Acl.renameUsers(Seq((("b", "%"), ("b2", "%")),
        (("nope", "%"), ("x", "%"))))
    }
    assert(Acl.checkPassword("b", "%", "pa"))
    assert(Acl.verify("b", "%", "graft", "customer", "SELECT",
      honorActiveRoles = true))
    assert(!Acl.checkPassword("b2", "%", "pa"))
    Acl.clear()
  }

  test("q_show_backups: the in-flight staging dir is rebuilt per run " +
    "and renders running with zero durable rows") {
    val rows = q("q_show_backups").collect()
    val running = rows.find(_.getAs[String]("state") == "running")
    assert(running.isDefined && running.get.getAs[Long]("n_rows") == 0L)
    val done = rows.filter(_.getAs[String]("state") == "done")
    assert(done.length == 2 &&
      done.forall(_.getAs[Long]("n_rows") == t.orders.count()))
  }

  // --- OUTFILE grammar round trip (select_into.go / load_data.go) ---

  test("Outfile.unescEnclosed inverts escEnclosed on every escape " +
    "class, including the \\\\0 disambiguation trap") {
    import graft.operators.Outfile
    import spark.implicits._
    // The killer case: a literal backslash FOLLOWED by the char '0'
    // escapes to \\0 (three bytes: \ \ 0) — a naive sequential
    // unescape would read the tail \0 as NUL.
    val probes = Seq("plain", "a\"b", "c\\d", "e\u0000f", "g\nh",
      "\\0", "x\\", "\"\"", "\u0000", "tail\\")
    val df = probes.toDF("s")
      .select(col("s"), Outfile.unescEnclosed(
        Outfile.escEnclosed(col("s"))).as("rt"))
    df.collect().foreach(r =>
      assert(r.getString(0) == r.getString(1),
        s"round trip broke on ${r.getString(0).map(_.toInt)}"))
    // And the escaped forms contain no raw NUL (always \0-rendered).
    val esc = probes.toDF("s")
      .select(Outfile.escEnclosed(col("s"))).collect()
    esc.foreach(r => assert(!r.getString(0).contains("\u0000")))
  }

  test("Outfile grammar: exhaustive 3-byte torture over the escape " +
    "alphabet round-trips (343 combos, every adjacency)") {
    import spark.implicits._
    import graft.operators.Outfile
    // Every ordered triple over the full escape alphabet — covers
    // all adjacencies a random generator can miss (backslash before
    // '0', quote after escaped backslash, NUL at each position...).
    // U+0001 and the letter-escape letters are IN the alphabet: the
    // former was the old parking byte (a genuine U+0001 in source
    // data must survive the trip), the latters ('n', 't') must not
    // be mistaken for their control bytes when they follow an
    // escaped backslash.
    val alpha = Seq("a", "\\", "\"", "\n", "\u0000", ";", "0",
      "\u0001", "n", "t")
    val probes = for (x <- alpha; y <- alpha; z <- alpha) yield x + y + z
    val rt = probes.toDF("s")
      .select(col("s"), Outfile.unescEnclosed(
        Outfile.escEnclosed(col("s"))).as("rt"))
      .collect()
    rt.foreach(r => assert(r.getString(0) == r.getString(1),
      s"broke on bytes ${r.getString(0).map(_.toInt).mkString(",")}"))
  }

  test("unescEnclosed decodes MySQL letter escapes to control " +
    "bytes (load_data.go escapeChar table)") {
    import graft.operators.Outfile
    // Files written by the reference/MySQL letter-encode control
    // bytes; the loader must map them, while an escaped backslash
    // followed by the same letter stays a literal two-char pair.
    assert(Outfile.unescape("a\\tb") == "a\tb")
    assert(Outfile.unescape("a\\nb") == "a\nb")
    assert(Outfile.unescape("a\\rb") == "a\rb")
    assert(Outfile.unescape("a\\bb") == "a\bb")
    assert(Outfile.unescape("a\\Zb") == "a\u001ab")
    assert(Outfile.unescape("a\\0b") == "a\u0000b")
    assert(Outfile.unescape("a\\\\tb") == "a\\tb")
    assert(Outfile.unescape("tail\\") == "tail\\")
    assert(Outfile.unescape(null) == null)
  }

  test("unescEnclosed is a codegen'd expression: the load projection " +
    "carries no UDF and stays whole-stage; multi-byte UTF-8 survives") {
    import graft.operators.Outfile
    import spark.implicits._
    // UTF-8 multi-byte: continuation bytes can never equal 0x5C, so
    // the byte walk must pass 2/3/4-byte sequences through intact —
    // bare, and with an escape byte in front (default branch keeps
    // the lead byte, continuations copy on the non-escape branch).
    val probes = Seq("héllo", "日本語", "a\\é", "emoji 😀!",
      "\\日x", null)
    val df = probes.toDF("s")
      .select(col("s"), Outfile.unescEnclosed(
        Outfile.escEnclosed(col("s"))).as("rt"))
    df.collect().foreach(r =>
      assert(r.getString(0) == r.getString(1)))
    // THE point of the expression port: no ScalaUDF eval fence in the
    // plan — the projection compiles into one WholeStageCodegen span.
    // Asserted over a PARQUET-backed projection: a local-relation
    // input constant-folds to a LocalTableScan (the interpreted eval
    // ran at optimize time — correct, but no execution to inspect).
    val scanned = t.customer
      .select(col("c_name"), Outfile.unescEnclosed(
        Outfile.escEnclosed(col("c_name"))).as("rt"))
    assert(scanned.filter(col("c_name") =!= col("rt")).count() == 0)
    val plan = scanned.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"UDF survived in:\n$plan")
    // The `*(n)` star on the Project IS the whole-stage-codegen
    // marker in the compact plan rendering — the unescape projection
    // must sit inside a codegen stage, not in an interpreted Project.
    assert("""\*\(\d+\) Project \[[^\]]*graft_unescape""".r
      .findFirstIn(plan.replace("\n", " ")).isDefined, plan)
    // And the letter-escape decode runs through the SAME kernel from
    // generated code (literal input → expression output).
    val dec = Seq("a\\tb\\0c\\Z").toDF("s")
      .select(Outfile.unescEnclosed(col("s"))).head().getString(0)
    assert(dec == "a\tb\u0000c\u001a")
  }

  test("q_load_outfile reconstructs the source rows exactly — the " +
    "write→load round trip is lossless, NULLs included") {
    val loaded = q("q_load_outfile").collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("nm"),
        Option(r.getAs[Double]("bal")))).toSet
    val src = t.customer.filter(col("c_custkey") < 500)
      .select(col("c_custkey"),
        concat(col("c_name"),
          when(col("c_custkey") % 4 === 0, ";x")
            .when(col("c_custkey") % 4 === 1, "\"q")
            .when(col("c_custkey") % 4 === 2, "\\z")
            .otherwise("")).as("nm"),
        when(col("c_custkey") % 7 === 0, lit(null))
          .otherwise(col("c_acctbal").cast("decimal(18,2)"))
          .cast("double").as("bal"))
      .collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("nm"),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(loaded == src)
    // NULL really rode through as \N, not as a string.
    assert(loaded.exists(_._3.isEmpty))
  }

  test("q_stmt_digest folds the literal-varying stream to exactly " +
    "three digests with per-template counts") {
    val rows = q("q_stmt_digest").collect()
      .map(r => r.getAs[String]("digest_text") ->
        r.getAs[Long]("n_statements")).toMap
    assert(rows.size == 3)
    assert(rows.keySet.forall(d => d.contains("?") &&
      d == d.toLowerCase && !d.contains("  ")))
    val total = t.orders.filter(col("o_orderkey") < 4000).count()
    assert(rows.values.sum == total)
  }

  test("q_func_aes: ECB is deterministic, GCM is nonce-randomized, " +
    "both round-trip; wrong key NULLs") {
    val rows = q("q_func_aes").collect()
    assert(rows.forall(_.getAs[Int]("wrong_key_nulls") == 1))
    // Determinism split, probed directly: same input twice.
    val probe = spark.sql(
      "SELECT aes_encrypt(cast('x' as binary), '0123456789abcdef', " +
        "'ECB', 'PKCS') AS a, aes_encrypt(cast('x' as binary), " +
        "'0123456789abcdef', 'ECB', 'PKCS') AS b, " +
        "aes_encrypt(cast('x' as binary), '0123456789abcdef', " +
        "'GCM', 'DEFAULT') AS c, aes_encrypt(cast('x' as binary), " +
        "'0123456789abcdef', 'GCM', 'DEFAULT') AS d").head()
    assert(java.util.Arrays.equals(probe.getAs[Array[Byte]]("a"),
      probe.getAs[Array[Byte]]("b")))
    assert(!java.util.Arrays.equals(probe.getAs[Array[Byte]]("c"),
      probe.getAs[Array[Byte]]("d")))
  }

  // --- SHOW CREATE VIEW/USER/DATABASE/SEQUENCE ---

  test("q_show_create_objects: the view text validates against the " +
    "catalog and the user render carries the real digest") {
    val rows = q("q_show_create_objects").collect()
      .map(r => r.getAs[String]("object_type") ->
        r.getAs[String]("ddl")).toMap
    assert(rows("VIEW").startsWith("CREATE VIEW v_rev2 AS SELECT"))
    // The rendered view text is executable as a query.
    val inner = rows("VIEW").stripPrefix("CREATE VIEW v_rev2 AS ")
    assert(spark.sql(inner).columns.length == 4)
    // The auth string is Acl's own double-SHA1 of the password.
    assert(rows("USER").contains(Acl.encodePassword("s3cure!")))
    assert(rows("DATABASE").contains("utf8mb4_bin"))
    assert(rows("SEQUENCE").contains("cache 100") &&
      rows("SEQUENCE").contains("cycle"))
  }
}
