package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
