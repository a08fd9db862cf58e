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
}
