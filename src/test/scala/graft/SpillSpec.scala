package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Spill-awareness proof (the 100 TB brief's "size partitions so they
  * fit — and survive when they don't" requirement): force the window
  * operator's per-partition row buffer through its spillable sorter
  * with production knobs and prove the results are IDENTICAL to the
  * in-memory run, with task metrics showing real spill bytes. The
  * thresholds are the same session confs an operator would size on a
  * cluster; correctness-under-spill is what makes them safe to turn. */
class SpillSpec extends SparkSpecBase {

  test("window buffer spills through its sorter: identical rows, " +
    "real spill bytes in task metrics") {
    // A frame big enough that per-group buffering genuinely exceeds
    // the lowered thresholds (three ~70k-row window partitions).
    def run(): Array[(Long, Long)] =
      spark.range(200000).selectExpr("id % 3 AS g", "id")
        .selectExpr("g",
          "sum(id) OVER (PARTITION BY g ORDER BY id " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) s")
        .groupBy("g").agg(org.apache.spark.sql.functions.max("s")
          .as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val keys = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
    val prevs = keys.map(k => k -> spark.conf.get(k))
    val base = run()
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // The buffer leaves its plain in-memory array at 1024 rows and
      // the sorter force-spills every 2048 — dozens of real spills
      // per partition, without the pathological per-4-row churn.
      keys.zip(Seq("1024", "2048")).foreach {
        case (k, v) => spark.conf.set(k, v)
      }
      val under = run()
      assert(under.toSeq == base.toSeq,
        "spilling changed the window results")
      // Listener events drain asynchronously; poll briefly.
      val deadline = System.nanoTime() + 15e9.toLong
      while (spilled.get() == 0L && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(spilled.get() > 0L,
        "lowered thresholds reported no spill bytes — the knob is dead")
    } finally {
      prevs.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("sort-merge join buffer spills under a tiny threshold with " +
    "identical join output — a registry entry stays correct under " +
    "memory pressure") {
    val keys = Seq(
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold")
    val prevs = keys.map(k => k -> spark.conf.get(k))
    // Sorted Seq (a multiset), not Set: a buffer-replay bug that
    // duplicates or drops ONE instance of a repeated row must fail.
    def run(): Seq[String] =
      Registry.byName("q_join_merge").run(t).collect()
        .map(_.toString).toSeq.sorted
    val base = run()
    try {
      keys.foreach(spark.conf.set(_, "4"))
      assert(run() == base, "spilling changed the merge-join results")
    } finally prevs.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
