package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dense dot product over two
  * `array<double>` columns, with whole-stage codegen.
  *
  * This is the custom-operator tier (b) from the build contract —
  * the higher-order-function formulation
  * (`aggregate(zip_with(a, b, ...))`) is interpreted per element and
  * allocates an intermediate array per row; this expression compiles
  * to a tight primitive loop inside WholeStageCodegen, which is what
  * a 100 TB ANN scan needs. Float embedding arrays arrive via an
  * implicit `array<float> → array<double>` cast, so the arithmetic
  * matches the DuckDB oracle exactly.
  *
  * Reference analog: tigraph/tidb vectorized builtins
  * (expression/builtin_arithmetic_vec.go) — fixed-function kernels
  * instead of interpreted expression trees.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Session-scoped registration of graft's native expressions, making
  * them callable from both the Column API (`call_function`) and SQL. */
object GraftFunctions {
  /** Numeric arrays (e.g. the float embeddings) are cast to
    * array<double> at the call boundary, so callers never need to
    * pre-convert. */
  private def toDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType))
  }

  def dotBuilder(exprs: Seq[Expression]): Expression =
    DotProduct(toDoubleArray(exprs.head), toDoubleArray(exprs(1)))

  /** Shared by the temp-function registration below and the
    * GraftExtensions injection — one builder, both session paths. */
  def cmsBuilder(exprs: Seq[Expression]): Expression =
    CmsEstimate(exprs.head, exprs(1))

  def register(spark: SparkSession): Unit = {
    // Gate PER FUNCTION: sessions built with GraftExtensions already
    // have graft_dot injected, and a shared gate would then skip
    // everything else (exactly what bit graft_cms_estimate in r4).
    def ensure(name: String,
        builder: Seq[Expression] => Expression): Unit =
      if (!spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst
            .FunctionIdentifier(name)))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          name, builder, "built-in")
    ensure("graft_dot", dotBuilder)
    ensure("graft_cms_estimate", cmsBuilder)
    // Spark's codegen'd bloom pair (BloomFilterAggregate /
    // BloomFilterMightContain) is runtime-filter-internal — not in
    // the public registry — so expose it under graft names instead of
    // probing through a Scala UDF. Values are hashed with XxHash64 on
    // BOTH sides (exactly what InjectRuntimeFilter does), so the
    // build and probe agree on the key domain; the filter argument to
    // the probe must be a constant/scalar-subquery per the
    // expression's own type check, which the collect-the-index-bytes
    // pattern satisfies with a Literal.
    ensure("graft_bloom_agg", exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(
            Seq(exprs.head)),
          exprs(1), exprs(2)))
    ensure("graft_bloom_contains", exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs.head,
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(exprs(1)))))
    ensure("graft_entropy_stats", exprs => EntropyStats(exprs.head))
    ensure("graft_json_depth", exprs => JsonDepth(exprs.head))
    ensure("graft_json_pretty", exprs => JsonPretty(exprs.head))
    ensure("graft_json_minify", exprs => JsonMinify(exprs.head))
    ensure("graft_compress",
      exprs => ZlibCompress(Cast(exprs.head, org.apache.spark.sql.types.BinaryType)))
    ensure("graft_uncompress",
      exprs => ZlibUncompress(Cast(exprs.head, org.apache.spark.sql.types.BinaryType)))
    TextStats.register(spark)
    RepStats.register(spark)
  }
}
