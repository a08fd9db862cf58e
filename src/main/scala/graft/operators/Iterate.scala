package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded fixpoint iteration — the Spark analog of TiDB's recursive
  * CTE executor (reference: /root/reference/executor/cte.go, which
  * loops seed → iterative part until an empty chunk).
  *
  * The driver-side twin of Spark 4's native WITH RECURSIVE
  * (UnionLoopExec — see q_cte_recursive_native), for loops whose step
  * is built with the DataFrame API: apply `step` to the previous frontier, union results,
  * stop on empty frontier or `maxIter`. `localCheckpoint` truncates
  * lineage so plan depth stays O(1) per iteration instead of stacking
  * maxIter unions of unresolved plans — essential once frontiers are
  * large (graph BFS at 100 TB) where re-deriving lineage each pass
  * would recompute the whole prefix.
  *
  * The only driver-side action per iteration is `isEmpty` on the new
  * frontier — O(1) result, no data collected.
  */
object Iterate {
  def unionLoop(seed: DataFrame, step: DataFrame => DataFrame,
      maxIter: Int): DataFrame = {
    var acc = seed.localCheckpoint()
    var frontier = acc
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = step(frontier).localCheckpoint()
      if (next.isEmpty) done = true
      else {
        acc = acc.union(next)
        frontier = next
      }
      i += 1
    }
    acc
  }
}
