package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

object SortedIntersectKernel {
  /** |A ∩ B| for two SORTED long arrays via a merge walk — O(n+m),
    * zero allocation. `array_intersect` builds a hash set AND
    * materializes the intersection array per row just to take its
    * size; on a neighborhood-similarity pass over millions of edges
    * that allocation is the dominant cost. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `sorted_intersect_count(a, b)`: intersection size of two sorted
  * array<bigint> columns, whole-stage-codegen'd. Inputs MUST be
  * sorted ascending and duplicate-free (sort_array ∘ collect_set);
  * the caller owns that invariant. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull arrays are rejected outright: ArrayData.getLong
    // reads a null slot as 0, so a null element would silently
    // corrupt counts (and break the sorted-walk invariant) instead
    // of failing analysis.
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, false) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs without null elements")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectKernel.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectKernel.count($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** `graft_bounded_collect_set(x, cap)`: collect_set over BIGINT with a
  * HARD per-group memory bound — the buffer never holds more than
  * cap+1 elements, even mid-scan over an unbounded hub's neighborhood
  * (insertion stops the moment the set exceeds the cap; cap+1 is the
  * overflow marker). Result: the SORTED duplicate-free array when the
  * true set size is ≤ cap, else NULL.
  *
  * This is what lets one aggregate exchange safely serve hub
  * CLASSIFICATION (nbrs IS NULL ⇔ deg > cap), per-vertex degree
  * output, and the adjacency arrays that [[SortedIntersectCount]]
  * consumes — plain collect_set can't be run before classification
  * because a single hub row would materialize an unbounded buffer
  * (the kTruss/g_clustering memory contract, reference
  * executor/graph.go neighborhood scans). */
case class BoundedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[Long]]
  with UnaryLike[Expression] {
  require(cap > 0, "bounded_collect_set cap must be positive")

  override def prettyName: String = "graft_bounded_collect_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT child, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  // Insert only while size ≤ cap: a NEW element at size==cap pushes the
  // set to cap+1 (overflow recorded), after which inserts stop — so a
  // true set of size ≤ cap is never truncated, and a larger one never
  // buffers more than cap+1 longs.
  override def update(buf: java.util.HashSet[Long],
      input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null && buf.size <= cap) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.HashSet[Long],
      other: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = other.iterator()
    while (it.hasNext && buf.size <= cap) buf.add(it.next())
    buf
  }

  override def eval(buf: java.util.HashSet[Long]): Any = {
    if (buf.size > cap) null
    else {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }
  }

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashSet[Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BoundedCollectSet {
  /** Column wrapper: `boundedCollectSet(x, cap)` as an aggregate. */
  def col(child: Column, cap: Int): Column =
    GraftSqlShim.column(
      BoundedCollectSet(GraftSqlShim.expr(child), cap).toAggregateExpression())
}
