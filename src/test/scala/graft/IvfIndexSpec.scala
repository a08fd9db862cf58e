package graft

import graft.ann.IvfIndex
import graft.functions.VectorFns
import org.apache.spark.sql.functions._

/** Persisted IVF index: the cell-partitioned layout must return the
  * same neighbors as the in-memory build, and probing must prune to
  * the probed cell partitions (not scan the whole corpus).
  */
class IvfIndexSpec extends SparkSpecBase {

  private val dir = "/tmp/graft_ivf_index"

  private lazy val corpus = t.embeddings
    .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
  private lazy val queries = corpus.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private lazy val written = {
    IvfIndex.writeIndex(corpus, dir, c = 16, iters = 2)
    true
  }

  test("persisted index returns the in-memory probe results") {
    assert(written)
    val fromDisk = IvfIndex.probeIndex(spark, dir, queries,
      nprobe = 4, topk = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inMem = Registry.all.find(_.name == "s_ann_ivf").get.run(t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromDisk == inMem && fromDisk.nonEmpty)
  }

  test("s_ann_ivf_probe registry entry equals the in-query build") {
    val probe = Registry.all.find(_.name == "s_ann_ivf_probe").get.run(t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inMem = Registry.all.find(_.name == "s_ann_ivf").get.run(t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe == inMem && probe.nonEmpty)
  }

  test("probe prunes to the probed cell partitions") {
    assert(written)
    val plan = IvfIndex.probeIndex(spark, dir, queries,
      nprobe = 4, topk = 3).queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the cell scan:\n$plan")
  }

  test("s_ann_ivfpq_probe equals the in-query IVFPQ build and " +
    "prunes the code scan") {
    val probeDf = Registry.all.find(_.name == "s_ann_ivfpq_probe").get
      .run(t)
    val probe = probeDf
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inMem = Registry.all.find(_.name == "s_ann_ivfpq").get.run(t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe == inMem && probe.nonEmpty)
    // The cell-partitioned code scan must be dynamically pruned by
    // the broadcast probe side — the nprobe/C read is the entry's
    // whole scale story. Inspect the plan of the DataFrame that
    // actually executed.
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the code scan:\n$plan")
  }

  test("incremental append: probe-after-append equals a rebuild at " +
      "the same fixed centroids; drift card arithmetic is exact") {
    val rootA = "/tmp/graft_ivf_inc_a"
    val rootB = "/tmp/graft_ivf_inc_b"
    Seq(rootA, rootB).foreach(d =>
      graft.sources.Formats.deleteRecursively(new java.io.File(d)))
    val base = corpus.filter(col("vec_id") % 5 =!= 0)
    val batch = corpus.filter(col("vec_id") % 5 === 0)
    // Index A: train on the base, append the batch incrementally.
    IvfIndex.writeIndex(base, rootA, c = 16, iters = 2)
    IvfIndex.appendToIndex(spark, rootA, batch)
    // Index B: the SAME centroids, the whole corpus assigned from
    // scratch (what a rebuild at fixed centroids produces).
    spark.read.parquet(s"$rootA/centroids")
      .write.parquet(s"$rootB/centroids")
    IvfIndex.appendToIndex(spark, rootB, corpus)
    // Append really appended: every corpus vector is in index A once.
    assert(spark.read.parquet(s"$rootA/cells").count() == corpus.count())
    // Probe parity — append is indistinguishable from the rebuild.
    def probe(d: String) = IvfIndex.probeIndex(spark, d, queries,
      nprobe = 4, topk = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (pa, pb) = (probe(rootA), probe(rootB))
    assert(pa == pb && pa.nonEmpty)
    // Drift card: growth = inertia_after / inertia_base per cell,
    // retrain flags exactly the cells past the cap (or base-less
    // ones); base/new counts partition each cell.
    val card = IvfIndex.driftCard(spark, rootA,
      isNew = col("vec_id") % 5 === 0, growthCap = 1.5).collect()
    assert(card.nonEmpty)
    val nTotal = card.map(r =>
      r.getAs[Long]("n_base") + r.getAs[Long]("n_new")).sum
    assert(nTotal == corpus.count())
    card.foreach { r =>
      val nNew = r.getAs[Long]("n_new")
      val ib = Option(r.getAs[java.lang.Double]("inertia_base"))
      val inew = Option(r.getAs[java.lang.Double]("inertia_new"))
      val growth = Option(r.getAs[java.lang.Double]("growth"))
      val retrain = r.getAs[Int]("retrain")
      if (nNew == 0L) assert(retrain == 0,
        "an untouched cell must never flag retrain")
      else (ib, inew, growth) match {
        case (Some(b), Some(nv), Some(g)) if b > 0 =>
          assert(math.abs(g - nv / b) < 1e-4,
            s"growth mismatch on cell ${r.getAs[Int]("cell")}")
          assert(retrain == (if (g > 1.5) 1 else 0))
        case _ => assert(retrain == 1,
          "an appended-to cell without a healthy base yardstick " +
            "must flag retrain")
      }
    }
    // The card is the RETRAIN decision: on this near-uniform append
    // (a 20% slice of the same distribution) most cells must NOT
    // demand a retrain — the signal has a quiet zero state.
    assert(card.count(_.getAs[Int]("retrain") == 0) > card.length / 2)
  }
}
