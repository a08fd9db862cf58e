package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, when}

/** Bounded fixpoint iteration — the Spark analog of TiDB's recursive
  * CTE executor (reference: /root/reference/executor/cte.go, which
  * loops seed → iterative part until an empty chunk).
  *
  * The driver-side twin of Spark 4's native WITH RECURSIVE
  * (UnionLoopExec — see q_cte_recursive_native), for loops whose step
  * is built with the DataFrame API: apply `step` to the previous
  * frontier, union results, stop on empty frontier or `maxIter`.
  * `localCheckpoint` truncates lineage so plan depth stays O(1) per
  * materialization instead of stacking maxIter unions of unresolved
  * plans — essential once frontiers are large (graph BFS at 100 TB)
  * where re-deriving lineage each pass would recompute the whole
  * prefix.
  *
  * `batch` controls how many levels are declared LAZILY between
  * materializations: each driver round costs a fixed scheduling floor
  * (~0.4 s on local[32]; job submit + checkpoint + emptiness action),
  * so shallow-but-many-level loops (arithmetic recursions, long
  * chains with small frontiers) should batch several levels into one
  * job. Levels inside a batch are tagged, checkpointed as ONE union,
  * and the last level is re-sliced from the materialized batch rather
  * than recomputed. Note the cost model honestly: within a batch each
  * level is an independent union branch whose lineage re-applies
  * `step` 1..k times, so one materialization evaluates O(batch²/2)
  * step applications — batching only pays off when the step is a
  * narrow, cheap map/join relative to the ~0.4 s per-round scheduling
  * floor. Keep batch=1 when a single level can already be
  * executor-memory-sized (wide BFS frontiers): the per-level
  * empty-check then prunes work as early as possible, and no prefix
  * re-evaluation happens at all.
  */
object Iterate {
  def unionLoop(seed: DataFrame, step: DataFrame => DataFrame,
      maxIter: Int, batch: Int = 1): DataFrame = {
    var acc = seed.localCheckpoint()
    var frontier = acc
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      var levels = List.empty[DataFrame]
      var f = frontier
      while (levels.size < batch && i < maxIter) {
        f = step(f)
        levels ::= f
        i += 1
      }
      val lastIdx = levels.size - 1
      // The union of `batch` levels carries batch× the frontier's
      // partitions; left unchecked that compounds GEOMETRICALLY
      // (batch^rounds empty tasks — measured 32k partitions of 5 rows
      // by round 4). Coalesce back to the executor width before
      // materializing.
      val width = seed.sparkSession.sparkContext.defaultParallelism
      // LAZY checkpoint + ONE full-scan aggregate: the same job
      // materializes the batch and returns both loop scalars — total
      // rows (empty ⇒ done) and the last level's rows (the next
      // frontier; died-mid-batch ⇒ done). The old shape paid an
      // eager checkpoint job plus one or two isEmpty jobs per round
      // for the same information. For batch == 1 the two counts
      // coincide (the batch IS the last level), so the stop decision
      // is identical by construction.
      val tagged = levels.reverse.zipWithIndex
        .map { case (df, k) => df.withColumn("__lvl", lit(k)) }
        .reduce(_ union _)
        .coalesce(width)
        .localCheckpoint(false)
      val r = tagged.agg(count(lit(1)),
        count(when(col("__lvl") === lastIdx, true))).head()
      if (r.getLong(0) == 0L) done = true
      else {
        acc = acc.union(tagged.drop("__lvl"))
        frontier = tagged.filter(col("__lvl") === lastIdx).drop("__lvl")
        if (r.getLong(1) == 0L) done = true
      }
    }
    acc
  }
}
