package graft

import graft.graph.Graph

/** Round-5 wave: time-travel snapshots, all-paths enumeration,
  * charset/net scalar families (oracle-checked; semantics pinned
  * here). */
class Wave6Spec extends SparkSpecBase {

  private def q(name: String) = Registry.all.find(_.name == name).get.run(t)

  test("time travel: versions are distinct, monotone snapshots") {
    val dir = operators.Wave6.timeTravelStore(t)
    def v(k: Int) = spark.read.parquet(s"$dir/version=$k")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val v0 = v(0)
    val v1 = v(1)
    val v2 = v(2)
    // Each batch changes something, and upserts never delete keys.
    assert(v0 != v1 && v1 != v2)
    assert(v0.keySet.subsetOf(v1.keySet) && v1.keySet.subsetOf(v2.keySet))
    val base = t.orders.select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    assert(base.subsetOf(v0.keySet))
    // The AS-OF read IS version 1 — not latest.
    val asOf = q("q_time_travel").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(asOf == v1 && asOf != v2)
  }

  test("all-paths' shortest prefix equals top-k on the same bound") {
    val all = q("g_allpaths").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val topk = Graph(graph.GraphQueries.cappedEdges(t, 4))
      .topKShortestPaths(0L, 7L, k = 3, maxHops = 6).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(all.take(3).sameElements(topk))
    // Every enumerated path is simple and properly terminated.
    all.foreach { case (len, p) =>
      val nodes = p.split("->")
      assert(nodes.length == len + 1 && nodes.distinct.length == nodes.length)
      assert(nodes.head == "0" && nodes.last == "7")
    }
  }
}
