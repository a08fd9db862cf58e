package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate with MAP-SIDE COMBINE — the missing
  * primitive behind every "top-k per group over a huge pair set"
  * plan (kNN graphs, ANN re-ranks). A window `row_number() <= k`
  * exchanges EVERY candidate row to sort it inside its group; this
  * aggregate keeps a k-element buffer per (group, partition) during
  * the map pass, so only |groups| × k rows per partition reach the
  * exchange — for a kNN-graph pair set that is a 500× shuffle-volume
  * cut at k=3, and the gap widens linearly with candidates/query.
  *
  * Ordering contract — IDENTICAL to [[VectorFns.rerankTopK]]'s
  * window key, so results are interchangeable row-for-row:
  * rank DESC, then id ASC (the deterministic tie-break every ANN
  * entry hash-pins). Output: array<struct<id, payload>> in that
  * order, exactly k elements unless the group is smaller.
  *
  * Reference analog: the reference's executors stream-fold per-group
  * top-k in the TopN executor (executor/topn.go) instead of sorting
  * the full child — this is the same idea lifted to a distributed
  * partial aggregate.
  */
case class TopKByRank(
    rank: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with TernaryLike[Expression] {
  require(k > 0 && k <= 1024, "graft_topk k must be in [1, 1024]")

  override def first: Expression = rank
  override def second: Expression = id
  override def third: Expression = payload

  override def prettyName: String = "graft_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (rank.dataType, id.dataType, payload.dataType) match {
      case (DoubleType, LongType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (DOUBLE rank, BIGINT id, DOUBLE " +
          s"payload), got $other")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val r = rank.eval(input)
    val i = id.eval(input)
    if (r != null && i != null) {
      val p = payload.eval(input)
      buf.insert(r.asInstanceOf[Double], i.asInstanceOf[Long],
        if (p == null) 0.0 else p.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.ranks(i), other.ids(i), other.payloads(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = new GenericInternalRow(
        Array[Any](buf.ids(i), buf.payloads(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 24 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.ranks(i)).putLong(buf.ids(i))
        .putDouble(buf.payloads(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      // Serialized entries are already in buffer order; insert
      // re-establishes the invariant cheaply (append path).
      buf.insert(bb.getDouble, bb.getLong, bb.getDouble)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(rank = newFirst, id = newSecond, payload = newThird)
}

/** Sorted bounded buffer (rank DESC, id ASC), insertion-sort on
  * parallel primitive arrays — k is single digits in every caller,
  * so a shift-insert beats any heap and allocates nothing per row. */
final class TopKBuffer(val k: Int) {
  val ranks = new Array[Double](k)
  val ids = new Array[Long](k)
  val payloads = new Array[Double](k)
  var size = 0

  // Rank order MUST match Spark's DESC sort (the window form this
  // aggregate is row-for-row interchangeable with): NaN sorts ABOVE
  // every finite double there, so compare through Double.compare
  // (which orders NaN highest) instead of > / == — a zero-norm
  // vector's 0/0 cosine would otherwise never beat anything and be
  // silently dropped once the buffer is contested.
  private def beats(r: Double, i: Long, pos: Int): Boolean = {
    val c = java.lang.Double.compare(r, ranks(pos))
    c > 0 || (c == 0 && i < ids(pos))
  }

  def insert(r0: Double, i: Long, p: Double): Unit = {
    // Spark's sort normalizes -0.0 to 0.0 before comparing;
    // Double.compare orders -0.0 < 0.0 — normalize at entry so a
    // 0.0-vs-(-0.0) tie breaks on id exactly like the window form.
    val r = if (r0 == 0.0) 0.0 else r0
    if (size == k && !beats(r, i, size - 1)) return
    var pos = if (size < k) size else k - 1
    while (pos > 0 && beats(r, i, pos - 1)) {
      ranks(pos) = ranks(pos - 1)
      ids(pos) = ids(pos - 1)
      payloads(pos) = payloads(pos - 1)
      pos -= 1
    }
    ranks(pos) = r; ids(pos) = i; payloads(pos) = p
    if (size < k) size += 1
  }
}

object TopKByRank {
  /** `topK(rank, id, payload, k)` as an aggregate Column. */
  def col(rank: Column, id: Column, payload: Column, k: Int): Column =
    GraftSqlShim.column(TopKByRank(
      GraftSqlShim.expr(rank), GraftSqlShim.expr(id),
      GraftSqlShim.expr(payload), k).toAggregateExpression())
}
