package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized Count-Min sketch for an item's frequency
  * estimate (reference: tigraph/tidb keeps a CMSketch + TopN per
  * column for its statistics — statistics/cmsketch.go `QueryValue` —
  * and answers point-frequency questions from it instead of scanning).
  *
  * Spark builds the sketch with the builtin `count_min_sketch`
  * aggregate (mergeable, map-side partials) but ships no probe
  * function — this expression closes the loop: sketches stay tiny
  * binary blobs (eps/confidence-bounded, independent of data volume),
  * probes are driver-free row operations. Probe rows are
  * (group × candidate) — thousands at most — so interpreted eval with
  * a memoized deserialize is the right cost point; codegen would buy
  * nothing over the dominant sketch-build scan.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, bigint item), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  // One sketch is probed for many candidate rows in sequence; memoize
  // the last deserialization. Keyed by CONTENT, not reference —
  // UnsafeRow.getBinary allocates a fresh array per access, so a
  // reference check would never hit and every probe row would re-parse
  // the ~100 KB blob. Arrays.equals is a linear scan but cheap next
  // to readFrom's allocation + parse.
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (lastBytes == null || !java.util.Arrays.equals(bytes, lastBytes)) {
      lastSketch =
        CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      lastBytes = bytes
    }
    lastSketch.estimateCount(item.asInstanceOf[java.lang.Long])
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object Sketches {
  /** Column API for [[CmsEstimate]] (requires
    * [[GraftFunctions.register]], which every [[graft.Tables]] does). */
  def cmsEstimate(sketch: Column, item: Column): Column =
    call_function("graft_cms_estimate", sketch, item)
}
