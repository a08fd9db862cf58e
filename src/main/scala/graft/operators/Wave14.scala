package graft.operators

import graft.{Q, Tables}
import graft.functions.{TextFns, UserVars}
import graft.tools.StatementsSummary
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample-built ANALYZE: the shared boundary/sample machinery behind
  * q_analyze_sample and q_stats_histogram's scale mode (reference:
  * statistics/row_sampler.go — ANALYZE collects a row sample, never
  * a full materialization — and statistics/builder.go:143-147
  * buildHist, whose sampleFactor = count/sampleNum scales sample
  * bucket counts back to table cardinality and whose ndvFactor =
  * min(count/ndv, sampleFactor) caps per-value repeat estimates).
  * The sample is the d_mix_sample DETERMINISTIC multiplicative-hash
  * coin, so the DuckDB oracle reproduces the EXACT row set — no
  * engine RNG — and a resumed 100 TB ANALYZE re-selects the
  * identical sample.
  */
object SampleStats {

  /** ANALYZE's sample rate for the orders stats entries. */
  val SampleRate = 0.2

  /** Equi-depth inner-boundary quantiles (8 buckets). */
  val Quantiles: Seq[Double] = Seq(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)

  /** The analyzed value: o_totalprice as exact-decimal-derived
    * double — ONE spelling shared by the boundary aggregate and the
    * bucketing pass (and by q_stats_histogram). */
  def price: Column = Exact.dec2(col("o_totalprice")).cast("double")

  /** The deterministic ANALYZE sample of orders. Map-side filter —
    * at 100 TB this is the entire point: every downstream stats
    * aggregate touches rate·N rows, and the coin is pure integer
    * arithmetic on the key, so the sample is reproducible across
    * engines and re-runs. */
  def sampledOrders(t: Tables): DataFrame =
    t.orders.filter(
      TextFns.knuthCoin(col("o_orderkey")) < lit(SampleRate) * 4294967296L)

  /** One-row boundary aggregate: n rows + the 7 rounded inner
    * boundaries of `price` over `orders` (full table or sample —
    * the builder.go input swap is literally this parameter). */
  def priceBounds(orders: DataFrame): DataFrame = {
    val exprs = count(lit(1)).as("n_samp") +:
      Quantiles.zipWithIndex.map { case (q, i) =>
        round(percentile(price, lit(q)), 4).as(s"b$i")
      }
    orders.agg(exprs.head, exprs.tail: _*)
  }

  /** Map-side equi-depth bucket id against the broadcast boundaries
    * (ties left: strict >), 1-based. */
  def bucketOf: Column =
    Quantiles.indices
      .map(i => when(col("v") > col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _) + 1

  /** Per-JVM memo of the boundary ROW per (dir, sampled-input) —
    * the Bpe.mergesFor pattern. The percentile boundary aggregate is
    * the stats family's dominant cost (probed in r15: the decimal
    * percentile kernel, not data volume), and q_stats_histogram /
    * q_selectivity / q_stats_buckets / q_analyze_sample all consume
    * the SAME 8-bucket structure — so the kernel runs once per
    * session per (dir, input) and every later consumer gets the row
    * as literals. Same immutability contract as Bpe: a test that
    * regenerates a dir in place calls [[resetMemo]] first. */
  private val boundsMemo = new scala.collection.concurrent.TrieMap[
    (String, Boolean), org.apache.spark.sql.Row]

  def boundsRow(t: Tables, sampled: Boolean = false)
      : org.apache.spark.sql.Row =
    boundsMemo.getOrElseUpdate((t.dir, sampled),
      priceBounds(if (sampled) sampledOrders(t) else t.orders).head())

  /** Test-visible escape hatch for the immutable-input assumption. */
  def resetMemo(): Unit = boundsMemo.clear()

  /** One-row LITERAL DataFrame with [[priceBounds]]' exact schema,
    * built from the memoized row: consumers keep their
    * crossJoin(broadcast(...)) shape — now against a LocalRelation
    * of constants, so the bucketing comparisons constant-fold into
    * whole-stage codegen and no consumer re-runs the percentile
    * kernel. */
  def litBounds(t: Tables, sampled: Boolean = false): DataFrame = {
    val r = boundsRow(t, sampled)
    t.spark.range(1).select(
      lit(r.getLong(0)).as("n_samp") +:
        Quantiles.indices.map(i => lit(r.getDouble(i + 1)).as(s"b$i")): _*)
  }
}

/** Round-10 wave: the operational-surface closers from the r9 gap
  * list — sample-built ANALYZE with the sampleFactor correction,
  * session user variables, the statements-summary observability
  * table, and the placement-rules metadata card.
  */
object Wave14 {

  val all: Seq[Q] = Seq(

    // Sample-built ANALYZE (reference: statistics/row_sampler.go
    // RowSampleCollector — ANALYZE reads a SAMPLE, the #1
    // operational cost difference at 100 TB where full-scan stats
    // are not run daily — and statistics/builder.go:143-147: the
    // histogram built FROM the sample scales each bucket count by
    // sampleFactor = count/sampleNum, and caps the per-value repeat
    // estimate by ndvFactor = min(count/ndv, sampleFactor)). Here
    // the sample is the d_mix_sample deterministic hash coin (20%),
    // so the oracle reproduces the exact sample and the whole
    // correction arithmetic is hash-checkable: per equi-depth bucket
    // of the SAMPLE — boundaries are sample percentiles, the
    // builder's actual input — the entry reports the sample count,
    // the sampleFactor-scaled row estimate, sample NDV and its
    // scaled estimate, the capped repeat estimate, value bounds and
    // the factor itself. n_full is one COUNT(*) (metadata-cheap) —
    // the ONLY full-table input. The table NDV feeding ndvFactor is
    // estimated FROM THE SAMPLE, the analog of the reference's
    // sample-collected FM sketch (statistics/fmsketch.go;
    // row_sampler.go collects it; builder.go:147 caps with it): the
    // Duj1 scale-up estimator (Haas & Stokes 1998 — the PostgreSQL
    // ANALYZE estimator) D = n*d / (n - f1 + f1*n/N) over the
    // sample's value-frequency profile (d = sample NDV, f1 =
    // singletons, n = sample rows, N = table rows) — deterministic
    // because the sample is the hash coin, so the whole arithmetic
    // stays hash-checkable. Plan: sample filter is map-side, all
    // 1-row stats broadcast back, bucketing is map-side against 7
    // constants; NO full-table distinct anywhere (plan-asserted:
    // the un-sampled orders scan reads zero columns) — the
    // q_stats_histogram shape with the ANALYZE input swap actually
    // demonstrated.
    Q("q_analyze_sample", Some(s"""
      WITH s AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
        FROM orders
        WHERE ${TextFns.knuthCoinSql("o_orderkey")} < 0.2 * 4294967296),
      f AS (SELECT COUNT(*) AS n_full FROM orders),
      g AS (SELECT v, COUNT(*) AS c FROM s GROUP BY v),
      nd AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS d_samp,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS f1,
               CAST(SUM(c) AS DOUBLE) AS nsd
        FROM g),
      est AS (
        SELECT nsd * d_samp / (nsd - f1 + f1 * nsd / n_full) AS ndv_est
        FROM nd, f),
      b AS (
        SELECT COUNT(*) AS n_samp,
               [round(quantile_cont(v, 0.125), 4),
                round(quantile_cont(v, 0.25), 4),
                round(quantile_cont(v, 0.375), 4),
                round(quantile_cont(v, 0.5), 4),
                round(quantile_cont(v, 0.625), 4),
                round(quantile_cont(v, 0.75), 4),
                round(quantile_cont(v, 0.875), 4)] AS bs
        FROM s),
      m AS (
        SELECT v, 1 + len(list_filter(bs, x -> s.v > x)) AS bucket,
               CAST(n_full AS DOUBLE) / n_samp AS sf,
               LEAST(CAST(n_full AS DOUBLE) / ndv_est,
                     CAST(n_full AS DOUBLE) / n_samp) AS rf,
               ndv_est
        FROM s, b, f, est)
      SELECT CAST(bucket AS INT) AS bucket,
             COUNT(*) AS n_sample,
             ROUND(COUNT(*) * MIN(sf), 4) AS est_rows,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv_sample,
             ROUND(COUNT(DISTINCT v) * MIN(sf), 4) AS est_ndv,
             ROUND(MIN(rf), 4) AS repeat_est,
             ROUND(MIN(ndv_est), 4) AS ndv_table_est,
             MIN(v) AS lo, MAX(v) AS hi,
             ROUND(MIN(sf), 6) AS sample_factor
      FROM m GROUP BY bucket
    """)) { t =>
      val sample = SampleStats.sampledOrders(t)
        .select(SampleStats.price.as("v"))
      val bounds = SampleStats.litBounds(t, sampled = true)
      val full = t.orders.agg(count(lit(1)).as("n_full"))
      val nd = sample.groupBy("v").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).cast("long").as("d_samp"),
          sum(when(col("c") === 1, 1).otherwise(0)).cast("long")
            .as("f1"),
          sum(col("c")).cast("double").as("nsd"))
      sample.crossJoin(broadcast(bounds)).crossJoin(broadcast(full))
        .crossJoin(broadcast(nd))
        .withColumn("ndv_est", col("nsd") * col("d_samp") /
          (col("nsd") - col("f1") +
            col("f1") * col("nsd") / col("n_full")))
        .withColumn("sf", col("n_full").cast("double") / col("n_samp"))
        .withColumn("rf",
          least(col("n_full").cast("double") / col("ndv_est"), col("sf")))
        .select(col("v"), SampleStats.bucketOf.as("bucket"),
          col("sf"), col("rf"), col("ndv_est"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_sample"),
          round(count(lit(1)) * min(col("sf")), 4).as("est_rows"),
          countDistinct(col("v")).as("ndv_sample"),
          round(countDistinct(col("v")) * min(col("sf")), 4).as("est_ndv"),
          round(min(col("rf")), 4).as("repeat_est"),
          round(min(col("ndv_est")), 4).as("ndv_table_est"),
          min(col("v")).as("lo"), max(col("v")).as("hi"),
          round(min(col("sf")), 6).as("sample_factor"))
    },

    // Column ORDER CORRELATION (reference: statistics/builder.go:190
    // calcCorrelation — the Pearson correlation between each sample's
    // ordinal in HANDLE order and its ordinal in VALUE order, stored
    // on every histogram as hg.Correlation; the CBO's clustering
    // factor: corr ≈ ±1 means an index range scan touches contiguous
    // rows, ≈ 0 means it scatters). Same closed form as the
    // reference: with both rank sets equal to 0..n−1, Σx = n(n−1)/2
    // and Σx² = (n−1)n(2n−1)/6 are exact integers, so
    // corr = (n·Σxy − Σx²ₚ) / (n·Σx2 − Σx²ₚ) needs only ONE data
    // aggregate (Σxy) — all-integer until the final division, so the
    // hash check is exact, no float-summation noise. Input is the
    // ANALYZE machinery's BOUNDED sample: the deterministic hash
    // coin capped to the 10,000 smallest hash values (the
    // row_sampler.go maxSampleSize contract) via TakeOrdered — so
    // the two rank windows run over a CONSTANT-bounded row set, the
    // one case where a partition-less window is legitimate (the same
    // bound the reference's driver-side sort relies on).
    Q("q_stats_correlation", Some(s"""
      WITH s AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
        FROM orders
        WHERE ${TextFns.knuthCoinSql("o_orderkey")} < 0.2 * 4294967296
        ORDER BY ${TextFns.knuthCoinSql("o_orderkey")}, o_orderkey
        LIMIT 10000),
      r AS (
        SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS x,
               ROW_NUMBER() OVER (ORDER BY v, o_orderkey) - 1 AS y
        FROM s),
      a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM r)
      SELECT 'o_totalprice' AS col, n AS n_samples,
             CASE WHEN n <= 1 THEN 1.0 ELSE
               ROUND(CAST(n * sxy - (n * (n - 1) // 2) * (n * (n - 1) // 2)
                       AS DOUBLE) /
                     (n * ((n - 1) * n * (2 * n - 1) // 6) -
                      (n * (n - 1) // 2) * (n * (n - 1) // 2)), 6)
             END AS order_corr
      FROM a
    """)) { t =>
      import org.apache.spark.sql.expressions.Window
      val h = TextFns.knuthCoin(col("o_orderkey"))
      val s = t.orders
        .filter(h < lit(0.2) * 4294967296L)
        .select(col("o_orderkey"), SampleStats.price.as("v"),
          h.as("h"))
        .orderBy(col("h"), col("o_orderkey"))
        .limit(10000)
      val r = s
        .withColumn("x",
          row_number().over(Window.orderBy("o_orderkey")) - 1)
        .withColumn("y",
          row_number().over(Window.orderBy("v", "o_orderkey")) - 1)
      val a = r.agg(count(lit(1)).cast("long").as("n"),
        sum(col("x").cast("long") * col("y")).cast("long").as("sxy"))
      // Integer `div` keeps every term exact in BIGINT on both
      // engines (n·Σxy peaks ~1e16 — representable as long, NOT as
      // double), matching the oracle's `//` arithmetic bit-for-bit.
      // n <= 1 guard: the reference's calcCorrelation returns 1 for a
      // single-row sample (statistics/builder.go:191) — unguarded,
      // both numerator and denominator are 0 (NaN / div-0).
      a.select(lit("o_totalprice").as("col"), col("n").as("n_samples"),
        when(col("n") <= 1, lit(1.0)).otherwise(round(
          expr("CAST(n * sxy - (n * (n - 1) div 2) * " +
            "(n * (n - 1) div 2) AS DOUBLE)") /
          expr("n * ((n - 1) * n * (2 * n - 1) div 6) - " +
            "(n * (n - 1) div 2) * (n * (n - 1) div 2)"),
          6)).as("order_corr"))
    },

    // Histogram SELECTIVITY estimation (reference:
    // statistics/selectivity.go — predicate selectivity from the
    // column histogram drives every CBO row estimate — and
    // statistics/scalar.go calcFraction: within the bucket a range
    // endpoint lands in, the fraction is LINEAR interpolation
    // between the bucket bounds). The entry builds the 8-bucket
    // equi-depth histogram over o_totalprice (the q_stats_histogram
    // structure), then estimates rows for `v <= 150000`: full
    // buckets below the constant count whole, the straddling bucket
    // contributes cnt · (C − lo)/(hi − lo) clamped to [0,1], buckets
    // above contribute zero — and reports the estimate beside the
    // ACTUAL count and the relative error, so the estimator's
    // accuracy is itself part of the hash-checked contract. Both
    // engines state the identical arithmetic; the estimate aggregate
    // is 8 rows, the actual is one map-side filter count.
    Q("q_selectivity", Some(s"""
      WITH v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
        FROM orders),
      b AS (
        SELECT COUNT(*) AS n_samp,
               [round(quantile_cont(v, 0.125), 4),
                round(quantile_cont(v, 0.25), 4),
                round(quantile_cont(v, 0.375), 4),
                round(quantile_cont(v, 0.5), 4),
                round(quantile_cont(v, 0.625), 4),
                round(quantile_cont(v, 0.75), 4),
                round(quantile_cont(v, 0.875), 4)] AS bs
        FROM v),
      m AS (
        SELECT v.v, 1 + len(list_filter(bs, x -> v.v > x)) AS bucket
        FROM v, b),
      h AS (
        SELECT bucket, COUNT(*) AS cnt, MIN(v) AS lo, MAX(v) AS hi
        FROM m GROUP BY bucket),
      e AS (
        SELECT SUM(CASE
          WHEN hi <= 150000.0 THEN CAST(cnt AS DOUBLE)
          WHEN lo > 150000.0 THEN 0.0
          ELSE cnt * LEAST(GREATEST(COALESCE(
            (150000.0 - lo) / NULLIF(hi - lo, 0), 1.0), 0.0), 1.0)
          END) AS est
        FROM h),
      a AS (SELECT COUNT(*) AS actual FROM v WHERE v <= 150000.0)
      SELECT 'o_totalprice <= 150000' AS predicate,
             ROUND(est, 4) AS est_rows,
             CAST(actual AS BIGINT) AS actual_rows,
             ROUND(ABS(est - actual) / actual, 4) AS rel_err
      FROM e, a
    """)) { t =>
      val c = lit(150000.0)
      val vdf = t.orders.select(SampleStats.price.as("v"))
      val bounds = SampleStats.litBounds(t)
      val h = vdf.crossJoin(broadcast(bounds))
        .select(col("v"), SampleStats.bucketOf.as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
      val e = h.agg(sum(
        when(col("hi") <= c, col("cnt").cast("double"))
          .when(col("lo") > c, lit(0.0))
          .otherwise(col("cnt") * least(greatest(coalesce(
            (c - col("lo")) / nullif(col("hi") - col("lo"), lit(0.0)),
            lit(1.0)), lit(0.0)), lit(1.0)))).as("est"))
      val a = vdf.filter(col("v") <= c)
        .agg(count(lit(1)).as("actual"))
      e.crossJoin(broadcast(a))
        .select(lit("o_totalprice <= 150000").as("predicate"),
          round(col("est"), 4).as("est_rows"),
          col("actual").as("actual_rows"),
          round(abs(col("est") - col("actual")) / col("actual"), 4)
            .as("rel_err"))
    },

    // User variables — SET/GET @var (reference:
    // expression/builtin_other.go:697 setVarFunctionClass, :880
    // BuildGetVarFunction; names lowercase at :757, store =
    // per-session sessionVars.Users). Two halves of the @var
    // contract, split the way MySQL 8 itself split them:
    // (1) assign-then-read — SET @cut := (scalar subquery), then a
    // LATER statement filters on @cut: the scalar materializes once
    // into the UserVars session store (mixed-case name, read back
    // case-insensitively) and the reading plan inlines it as a
    // broadcast-free literal; (2) the per-row running idiom
    // (@rn := @rn + 1 per group) stated as its window equivalent —
    // row_number over (customer, date, key) — because per-row
    // session mutation is execution-order-dependent, exactly why the
    // idiom was deprecated in favor of windows; the partition key is
    // o_custkey (data-cardinality), so the window scales. The oracle
    // states @cut as a scalar CTE — the same assign-once-read-later
    // dataflow in pure SQL.
    Q("q_func_uservar", Some("""
      WITH v AS (
        SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 * 0.5 AS cut
        FROM orders),
      r AS (
        SELECT o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders)
      SELECT o_orderpriority, COUNT(*) AS n_above,
             CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first_above,
             ROUND(MIN(price), 2) AS min_price,
             ROUND((SELECT cut FROM v), 2) AS cut_value
      FROM r WHERE price > (SELECT cut FROM v)
      GROUP BY o_orderpriority
    """)) { t =>
      // Statement 1: SET @Cut := half the max price (session store).
      UserVars.assignScalar(t.spark, "Cut", t.orders.agg(
        (max(Exact.dec2(col("o_totalprice"))).cast("double") * 0.5).as("v")))
      // Statement 2: read @cut (case-insensitive) in a later plan.
      val rnW = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      t.orders
        .select(col("o_orderpriority"), col("o_custkey"),
          col("o_orderdate"), col("o_orderkey"),
          Exact.dec2(col("o_totalprice")).cast("double").as("price"))
        .withColumn("rn", row_number().over(rnW))
        .filter(col("price") > UserVars.read(t.spark, "CUT"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_above"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_first_above"),
          round(min(col("price")), 2).as("min_price"))
        .withColumn("cut_value",
          round(UserVars.read(t.spark, "cut"), 2))
    },

    // STATEMENTS_SUMMARY (reference: util/stmtsummary →
    // infoschema/tables.go:154 TableStatementsSummary;
    // executor/slow_query.go is the same render-history-as-a-table
    // idea for slow statements). The entry runs a pinned workload —
    // q_scan_filter TWICE (exec_count aggregation is the point of a
    // statement summary) and q_sort_topn once — through
    // StatementsSummary.record (each run drives the entry's own
    // adaptive plan and folds Trace's per-operator numOutputRows
    // into the in-memory summary), then renders the summary table:
    // one row per (entry, operator class) with exec_count, per-exec
    // node count, cumulative output rows, and summed/max wall ms.
    // Wall times are real clock — not oracle-statable — so the entry
    // is rows-only; Wave14Spec pins the deterministic columns
    // against an independent Trace.run of the same entries.
    Q("q_statements_summary", None) { t =>
      StatementsSummary.clear()
      StatementsSummary.record("q_scan_filter", t)
      StatementsSummary.record("q_scan_filter", t)
      StatementsSummary.record("q_sort_topn", t)
      StatementsSummary.summary(t.spark).orderBy("entry", "op")
    },

    // STATEMENTS_SUMMARY_HISTORY + slow log (reference:
    // infoschema/tables.go:155 tableStatementsSummaryHistory — the
    // rotated-window twin of the live summary — and
    // executor/slow_query.go, which renders persisted slow-statement
    // history as a threshold-filterable table). Two rotations of a
    // pinned workload: window 1 records q_scan_filter twice +
    // q_sort_topn once and rotates to disk (clearing the live
    // window — survival across clear() IS the history contract),
    // window 2 records q_scan_filter once more and rotates; the
    // entry renders the folded history, where q_scan_filter's
    // exec_count accumulates to 3 ACROSS windows and n_batches
    // distinguishes the digests seen in both. Batches are
    // content-keyed on the deterministic columns, so re-running the
    // entry overwrites its own two batches — idempotent history, no
    // unbounded growth. Wall columns are real clock → rows-only;
    // Wave14Spec proves re-read-equals-rotated and the slow-view
    // threshold fences.
    Q("q_slow_history", None) { t =>
      val F = graft.sources.Formats
      val dir = F.cacheDir(
        s"/tmp/graft_stmthist_${F.sanitize(t.dir)}",
        F.contentFingerprint(t.dir))
      // Reset the entry's OWN history dir first: batch keys hash the
      // deterministic columns, so a CODE change that shifts a plan's
      // node counts would mint new keys while the old batches stay
      // under the same data-fingerprinted dir — history() would fold
      // stale windows in and exec_count would creep. Each run renders
      // exactly its own two rotations. (The spec proves cross-
      // rotation persistence semantics on an independent dir.)
      F.deleteRecursively(new java.io.File(dir))
      StatementsSummary.clear()
      StatementsSummary.record("q_scan_filter", t)
      StatementsSummary.record("q_scan_filter", t)
      StatementsSummary.record("q_sort_topn", t)
      StatementsSummary.persistRotate(t.spark, dir)
      StatementsSummary.record("q_scan_filter", t)
      StatementsSummary.persistRotate(t.spark, dir)
      // Register the slow view (threshold 0 keeps the render
      // deterministic in ROW SET; real ops pass a real threshold)
      // and return the folded history.
      StatementsSummary.slowView(t.spark, dir, 0.0)
      StatementsSummary.history(t.spark, dir).orderBy("entry", "op")
    },

    // Session/runtime memtable card (reference: infoschema/tables.go
    // memtable list — CLUSTER_INFO / PROCESSLIST and friends are
    // virtual tables RENDERED from live runtime state, not stored —
    // and executor/memtable_reader.go, the executor that serves
    // them). The deterministic slice of that surface: engine version
    // class, scheduler mode, catalog implementation, loaded SQL
    // extensions, ANSI mode, the UTC-session invariant Tables
    // enforces, and one row per registered table with its LOADED
    // column count (events counted AFTER the ts normalization —
    // the reader-boundary schema a session actually serves). Every
    // value is DERIVED from the live session at run time and hash-
    // checked against the oracle's pinned literals, so a runtime
    // drift (version bump, extension unloaded, schema change) fails
    // correctness instead of passing silently.
    Q("q_memtable_info", Some("""
      SELECT * FROM (VALUES
        ('runtime', 'ansi_mode', 'true'),
        ('runtime', 'catalog', 'in-memory'),
        ('runtime', 'scheduler_mode', 'FIFO'),
        ('runtime', 'sql_extensions', 'graft.plans.GraftExtensions'),
        ('runtime', 'utc_session', 'true'),
        ('table', 'customer', '5'),
        ('table', 'documents', '5'),
        ('table', 'embeddings', '3'),
        ('table', 'events', '6'),
        ('table', 'lineitem', '11'),
        ('table', 'nation', '3'),
        ('table', 'orders', '6'),
        ('table', 'part', '6'),
        ('table', 'region', '2'),
        ('table', 'supplier', '4'),
        ('version', 'spark', '4.1')
      ) AS v(fact_type, name, value)
    """)) { t =>
      import t.spark.implicits._
      val sc = t.spark.sparkContext
      val runtime = Seq(
        ("runtime", "ansi_mode",
          t.spark.conf.get("spark.sql.ansi.enabled")),
        ("runtime", "catalog",
          sc.getConf.get("spark.sql.catalogImplementation", "in-memory")),
        ("runtime", "scheduler_mode",
          sc.getConf.get("spark.scheduler.mode", "FIFO")),
        ("runtime", "sql_extensions",
          sc.getConf.get("spark.sql.extensions", "")),
        ("runtime", "utc_session",
          Tables.isUtcSession(t.spark).toString),
        ("version", "spark",
          t.spark.version.split("\\.").take(2).mkString(".")))
      val tables = t.registered
        .map { case (n, df) => ("table", n, df.schema.size.toString) }
      (runtime ++ tables).toDF("fact_type", "name", "value")
        .orderBy("fact_type", "name")
    },

    // Cluster-inspection card (reference: executor/inspection_result.go
    // + inspection_summary.go — rule-based diagnostics over the
    // runtime memtables: config-consistency rules and data/threshold
    // rules rendered as (rule, item, status, detail) rows the
    // operator scans instead of ssh-ing around). The deterministic
    // analog: four config rules DERIVED from the live session (ANSI
    // on, shuffle partitions matching core count, UTC session, AQE
    // on — a drifted session renders 'warn' and fails the hash
    // against the oracle's expected-state card) and one data rule
    // per registered table (non-empty check with the row count in
    // the detail — the oracle COMPUTES the same counts from the same
    // parquet, so the rule is genuinely evaluated on both engines,
    // footer-cheap on the Spark side).
    Q("q_inspection", Some(s"""
      SELECT 'config' AS rule, 'ansi_mode_on' AS item,
             'ok' AS status, 'true' AS detail
      UNION ALL SELECT 'config', 'aqe_enabled', 'ok', 'true'
      UNION ALL SELECT 'config', 'shuffle_partitions_match_cores',
                       'ok', 'match'
      UNION ALL SELECT 'config', 'utc_session', 'ok', 'true'
      ${Seq("customer", "documents", "embeddings", "events",
        "lineitem", "nation", "orders", "part", "region", "supplier")
        .map(n => s"""
      UNION ALL SELECT 'data', '${n}_nonempty',
        CASE WHEN (SELECT COUNT(*) FROM $n) > 0
             THEN 'ok' ELSE 'warn' END,
        'rows=' || CAST((SELECT COUNT(*) FROM $n) AS VARCHAR)""")
        .mkString}
    """)) { t =>
      import t.spark.implicits._
      val sc = t.spark.sparkContext
      val ansi = t.spark.conf.get("spark.sql.ansi.enabled")
      val aqe = t.spark.conf.get("spark.sql.adaptive.enabled")
      val parts = t.spark.conf.get("spark.sql.shuffle.partitions")
      val partsMatch = parts == sc.defaultParallelism.toString
      val utc = Tables.isUtcSession(t.spark)
      def flag(b: Boolean) = if (b) "ok" else "warn"
      val config = Seq(
        ("config", "ansi_mode_on", flag(ansi == "true"), ansi),
        ("config", "aqe_enabled", flag(aqe == "true"), aqe),
        ("config", "shuffle_partitions_match_cores", flag(partsMatch),
          if (partsMatch) "match" else "mismatch"),
        ("config", "utc_session", flag(utc), utc.toString))
        .toDF("rule", "item", "status", "detail")
      // Data rules stay IN the returned plan (a union of footer-cheap
      // count aggregates), not eager driver actions — plan-only
      // consumers (Trace, explain tooling) must not pay 10 jobs just
      // to construct the DataFrame.
      val data = t.registered.map { case (n, df) =>
        df.agg(count(lit(1)).as("c"))
          .select(lit("data").as("rule"),
            lit(s"${n}_nonempty").as("item"),
            when(col("c") > 0, "ok").otherwise("warn").as("status"),
            concat(lit("rows="), col("c")).as("detail"))
      }.reduce(_ unionByName _)
      config.unionByName(data).orderBy("rule", "item")
    },

    // SHOW PLACEMENT metadata card (reference:
    // executor/show_placement.go — Target / Placement /
    // Scheduling_State rows rendering where each table's data is
    // placed and how). No multi-region scheduler exists locally; the
    // honest analog is the LAYOUT registry: each physical layout
    // this engine actually builds (range/hash/list partitioned
    // facts, the z-order layout) rendered as a placement row. The
    // engine side derives the policy strings from the SAME constants
    // the builders use (PartitionedFact.HashBuckets, the
    // PriorityLists partition names), so a layout change shows up as
    // a correctness diff against the oracle's pinned card rather
    // than silent doc drift.
    Q("q_show_placement", Some("""
      SELECT * FROM (VALUES
        ('TABLE lineitem_shipmonth',
         'PARTITION BY RANGE COLUMNS(shipmonth)', 'SCHEDULED'),
        ('TABLE orders_custhash',
         'PARTITION BY HASH(o_custkey) PARTITIONS 16', 'SCHEDULED'),
        ('TABLE orders_prioritylist',
         'PARTITION BY LIST COLUMNS(o_orderpriority) (p_low, p_normal, p_urgent)',
         'SCHEDULED'),
        ('TABLE events_zorder',
         'ZORDER(event_id, ts) BITS 16', 'SCHEDULED')
      ) AS v(target, placement, scheduling_state)
    """)) { t =>
      import t.spark.implicits._
      val listParts = graft.sources.PartitionedFact.PriorityLists
        .values.toSeq.distinct.sorted.mkString(", ")
      // Placement POLICIES render from the same catalog the
      // q_placement_policy lifecycle mutates (tools.PlacementPolicies)
      // — empty outside that entry's run, so this card's pinned
      // oracle holds; while policies exist, SHOW PLACEMENT serves
      // them here exactly as the reference's show_placement.go lists
      // policies before table rules.
      (graft.tools.PlacementPolicies.renderRows() ++ Seq(
        ("TABLE lineitem_shipmonth",
          "PARTITION BY RANGE COLUMNS(shipmonth)", "SCHEDULED"),
        ("TABLE orders_custhash",
          s"PARTITION BY HASH(o_custkey) PARTITIONS " +
            s"${graft.sources.PartitionedFact.HashBuckets}", "SCHEDULED"),
        ("TABLE orders_prioritylist",
          s"PARTITION BY LIST COLUMNS(o_orderpriority) ($listParts)",
          "SCHEDULED"),
        ("TABLE events_zorder",
          "ZORDER(event_id, ts) BITS 16", "SCHEDULED"),
      )).toDF("target", "placement", "scheduling_state")
    },
  )
}
