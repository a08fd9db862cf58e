package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics kernel.
  *
  * The text-quality / token-counting heuristics (SURVEY §2,
  * `t_quality` / `t_tokens`) need five counters per document that a
  * regex formulation computes with five separate scans, each
  * materialising a match array (`regexp_extract_all` + `size`) —
  * measured ~17 s of the sf0.1 bench. This expression computes all of
  * them in ONE code-point-aware pass over the UTF-8 bytes, with no
  * allocation beyond the tiny result row, and stays inside
  * WholeStageCodegen via a static kernel call.
  *
  * Counter semantics replicate the Java/RE2 regex classes the oracle
  * SQL uses, so results stay bit-identical to DuckDB:
  *  - `n_chars`  — code points, `LENGTH(text)`
  *  - `n_tokens` — maximal runs of `\S` (`regexp_extract_all '(\S+)'`)
  *  - `n_alpha`  — chars matching `[A-Za-z]`
  *  - `n_punct`  — chars matching `[^A-Za-z0-9\s]` (non-ASCII counts
  *                 here: both engines treat it as non-alnum/non-ws)
  *  - `n_ws`     — chars matching `\s` (ASCII `[ \t\n\x0B\f\r]`)
  *  - `bpe_tokens` — matches of `([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])`:
  *                 letter runs count once, every digit and every
  *                 other non-ws char counts individually.
  *
  * Reference analog: tigraph/tidb evaluates its string builtins as
  * fixed-function kernels per column chunk
  * (expression/builtin_string_vec.go) rather than per-row regex
  * machines — this is the Spark-native equivalent.
  */
object TextStatsKernel {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_ws", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false)))

  /** One pass over the raw UTF-8 bytes; multi-byte code points are
    * counted at their leading byte and classified "other". */
  def compute(s: UTF8String): InternalRow = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var nChars, nTokens, nAlpha, nPunct, nWs, bpe = 0
    var inTok = false
    var inLetters = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b & 0x80) == 0) {
        nChars += 1
        val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
          b == '\f' || b == '\r'
        val isAl = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
        val isDig = b >= '0' && b <= '9'
        if (isAl) {
          nAlpha += 1
          if (!inLetters) { bpe += 1; inLetters = true }
        } else {
          inLetters = false
          if (isWs) nWs += 1
          else { bpe += 1; if (!isDig) nPunct += 1 }
        }
        if (isWs) inTok = false
        else if (!inTok) { nTokens += 1; inTok = true }
      } else if ((b & 0xc0) != 0x80) { // leading byte of a multi-byte cp
        nChars += 1; nPunct += 1; bpe += 1
        inLetters = false
        if (!inTok) { nTokens += 1; inTok = true }
      } // continuation bytes: skip
      i += 1
    }
    new GenericInternalRow(
      Array[Any](nChars, nTokens, nAlpha, nPunct, nWs, bpe))
  }
}

/** `text_stats(text)` — struct of single-pass counters (see
  * [[TextStatsKernel]]). Null in → null out. */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsKernel.schema
  override def prettyName: String = "text_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextStatsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsKernel.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object TextStats {
  def registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("text_stats"),
    new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
    (exprs: Seq[Expression]) => TextStats(exprs.head))

  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("text_stats")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "text_stats", exprs => TextStats(exprs.head), "built-in")
}
