package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Broadcast range join — a whole-operator Catalyst extension
  * (custom-operator tier (c): LogicalPlan + Strategy + SparkPlan,
  * registered through SparkSessionExtensions).
  *
  * Spark plans a non-equi interval predicate
  * (`lo <= probe AND probe < hi`) as BroadcastNestedLoopJoin: every
  * probe row compares against EVERY build row — O(|probe|·|build|),
  * the kind of plan that dies at 100 TB even with a tiny build side.
  * This operator broadcasts the build side once, sorted by `lo`, and
  * each probe row binary-searches the interval list and scans only
  * the candidates that can still cover its value —
  * O(|probe|·(log |build| + matches)). The probe side is never
  * shuffled.
  *
  * Reference analog: tigraph/tidb turns interval predicates into
  * index range scans (planner ranger) instead of full scans; this
  * applies the same idea to a broadcast join.
  */
object RangeJoin {

  /** Inner-join `probeDf` rows to every `buildDf` row whose
    * [lo, hi) interval contains the probe expression's value. */
  def join(probeDf: DataFrame, buildDf: DataFrame, probe: Column,
      lo: Column, hi: Column): DataFrame = {
    val probeE = resolveAgainst(probeDf, probe)
    val loE = resolveAgainst(buildDf, lo)
    val hiE = resolveAgainst(buildDf, hi)
    // The comparator is built from the probe type alone, so mixed
    // types (e.g. INT probe vs BIGINT bounds) must fail at planning
    // time, not as a mid-job ClassCastException.
    require(probeE.dataType == loE.dataType && probeE.dataType == hiE.dataType,
      s"range join requires probe/lo/hi to share one type, got " +
        s"probe=${probeE.dataType.sql} lo=${loE.dataType.sql} " +
        s"hi=${hiE.dataType.sql}")
    comparator(probeE.dataType) // reject unsupported types up front
    GraftSqlShim.ofRows(probeDf.sparkSession,
      RangeJoinPlan(probeDf.queryExecution.analyzed,
        buildDf.queryExecution.analyzed, probeE, loE, hiE))
  }

  /** Resolve a Column to a concrete catalyst Expression against one
    * side's analyzed output (Spark 4's lazy ColumnNode wrapper is
    * not resolved by the analyzer inside custom plan nodes, so we
    * run a throwaway `select` through the analyzer and take the
    * resolved expression — attribute ids are stable because the
    * select shares the DataFrame's analyzed child). */
  private def resolveAgainst(df: DataFrame, c: Column): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    df.select(c).queryExecution.analyzed match {
      case Project(list, _) => list.head match {
        case a: Alias => a.child
        case e => e
      }
      case other => throw new IllegalStateException(
        s"unexpected plan resolving range-join column: $other")
    }
  }

  /** Total order on the probe/bound dataTypes we support. */
  private[plans] def comparator(dt: DataType): (Any, Any) => Int =
    dt match {
      case TimestampType | LongType => (a, b) =>
        java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case IntegerType | DateType => (a, b) =>
        java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
      case DoubleType => (a, b) =>
        java.lang.Double.compare(a.asInstanceOf[Double],
          b.asInstanceOf[Double])
      case other => throw new IllegalArgumentException(
        s"range join does not support $other bounds")
    }
}

/** Logical node: inner join on `lo <= probe AND probe < hi`. */
final case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
    probe: Expression, lo: Expression, hi: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangeJoinPlan]] onto [[BroadcastRangeJoinExec]]. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, probe, lo, hi) =>
      BroadcastRangeJoinExec(planLater(l), planLater(r), probe, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Physical broadcast range join.
  *
  * Build side: collected (broadcast-sized contract, like
  * BroadcastHashJoin's build side), intervals sorted by `lo`, shipped
  * once per executor together with a prefix-max of `hi`. Probe side:
  * streamed partition-wise; binary search finds the last interval
  * with `lo <= v`; the backward scan stops as soon as the prefix-max
  * of `hi` falls to `<= v`, i.e. it visits only intervals that could
  * still cover `v` — no nested loop.
  */
final case class BroadcastRangeJoinExec(left: SparkPlan,
    right: SparkPlan, probe: Expression, lo: Expression, hi: Expression)
    extends SparkPlan {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def children: Seq[SparkPlan] = Seq(left, right)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(left = newChildren(0), right = newChildren(1))

  override protected def doExecute(): RDD[InternalRow] = {
    val cmp = RangeJoin.comparator(probe.dataType)
    val boundLo = BindReferences.bindReference(lo, right.output)
    val boundHi = BindReferences.bindReference(hi, right.output)
    val toUnsafe = UnsafeProjection.create(right.output, right.output)
    val intervals: Array[(Any, Any, UnsafeRow)] = right.executeCollect()
      .map { row =>
        (boundLo.eval(row), boundHi.eval(row), toUnsafe(row).copy())
      }
      .filter(t => t._1 != null && t._2 != null)
      .sortWith((a, b) => cmp(a._1, b._1) < 0)
    val prefixMaxHi: Array[Any] = {
      val out = new Array[Any](intervals.length)
      var i = 0
      var best: Any = null
      while (i < intervals.length) {
        if (best == null || cmp(intervals(i)._2, best) > 0)
          best = intervals(i)._2
        out(i) = best
        i += 1
      }
      out
    }
    val bc = sparkContext.broadcast((intervals, prefixMaxHi))
    val probeExpr = probe
    val leftOutput = left.output
    val outAttrs = output

    left.execute().mapPartitions { iter =>
      val (ivals, pmax) = bc.value
      val boundProbe = BindReferences.bindReference(probeExpr, leftOutput)
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { probeRow =>
        val v = boundProbe.eval(probeRow)
        if (v == null || ivals.isEmpty) Iterator.empty
        else {
          var loI = 0
          var hiI = ivals.length - 1
          var last = -1
          while (loI <= hiI) {
            val mid = (loI + hiI) >>> 1
            if (cmp(ivals(mid)._1, v) <= 0) { last = mid; loI = mid + 1 }
            else hiI = mid - 1
          }
          new Iterator[InternalRow] {
            private var i = last
            private var nextRow: InternalRow = _
            private def advance(): Unit = {
              nextRow = null
              while (nextRow == null && i >= 0 && cmp(v, pmax(i)) < 0) {
                val iv = ivals(i)
                if (cmp(v, iv._2) < 0)
                  nextRow = project(joiner(probeRow, iv._3)).copy()
                i -= 1
              }
            }
            advance()
            override def hasNext: Boolean = nextRow != null
            override def next(): InternalRow = {
              val out = nextRow; advance(); out
            }
          }
        }
      }
    }
  }
}
