package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass REPETITION statistics kernel (t_quality_rep).
  *
  * The Gopher-style repetition signals need per-document token and
  * bigram frequency tables. The relational formulation explodes
  * every token and bigram and runs two (doc_id, gram) shuffles —
  * correct, but ~7 s of the sf0.1 bench for state that never needs
  * to leave the row. This kernel tokenizes on the single-space
  * convention (`STRING_SPLIT(text, ' ')` — empty tokens included,
  * matching the oracle), builds two open-addressing count tables
  * over 64-bit token/bigram hashes in thread-local scratch (zero
  * per-row allocation in steady state), and emits
  * (n_tok, n_types, max_tok, n_bg, max_bg) as one struct — the
  * whole query becomes scan → project, embarrassingly parallel.
  *
  * Distinctness is by 64-bit FNV-1a hash, not token text: two
  * different tokens in one document colliding on 64 bits
  * (~1e-16/doc) would perturb the counts; accepted and documented,
  * the same trade every hash-based sketch in the suite makes.
  */
object RepStatsKernel {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_types", IntegerType, nullable = false),
    StructField("max_tok", IntegerType, nullable = false),
    StructField("n_bg", IntegerType, nullable = false),
    StructField("max_bg", IntegerType, nullable = false)))

  private final class Scratch {
    var keys = new Array[Long](1 << 12)
    var counts = new Array[Int](1 << 12)
    var stamp = new Array[Int](1 << 12)
    var gen = 0
    def reset(needed: Int): Unit = {
      var cap = keys.length
      while (cap < needed * 4) cap <<= 1
      if (cap != keys.length) {
        keys = new Array[Long](cap)
        counts = new Array[Int](cap)
        stamp = new Array[Int](cap)
        gen = 0
      }
      gen += 1
    }
    /** Increment `h`, returning (newCount << 1 | isNewKey). */
    def bump(h: Long): Long = {
      val mask = keys.length - 1
      var i = (java.lang.Long.hashCode(h) & mask)
      while (true) {
        if (stamp(i) != gen) {
          stamp(i) = gen; keys(i) = h; counts(i) = 1
          return (1L << 1) | 1L
        } else if (keys(i) == h) {
          counts(i) += 1
          return counts(i).toLong << 1
        } else i = (i + 1) & mask
      }
      0L // unreachable
    }
  }
  private val tokTab = ThreadLocal.withInitial[Scratch](() => new Scratch)
  private val bgTab = ThreadLocal.withInitial[Scratch](() => new Scratch)

  private val FNV_OFFSET = 0xcbf29ce484222325L
  private val FNV_PRIME = 0x100000001b3L

  def compute(s: UTF8String): InternalRow = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // Upper bound on token count: spaces + 1.
    var spaces = 0
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ')
        spaces += 1
      i += 1
    }
    val toks = tokTab.get(); toks.reset(spaces + 2)
    val bgs = bgTab.get(); bgs.reset(spaces + 2)
    var nTok, nTypes, maxTok, nBg, maxBg = 0
    var h = FNV_OFFSET
    var prev = 0L
    var first = true
    i = 0
    while (i <= n) {
      val b: Byte = if (i < n)
        org.apache.spark.unsafe.Platform.getByte(base, off + i) else ' '
      if (b == ' ') { // token boundary (empty tokens count, as in split)
        nTok += 1
        val r = toks.bump(h)
        if ((r & 1L) == 1L) nTypes += 1
        val c = (r >> 1).toInt
        if (c > maxTok) maxTok = c
        if (!first) {
          nBg += 1
          val bh = (prev ^ (h * FNV_PRIME)) * FNV_PRIME
          val cb = (bgs.bump(bh) >> 1).toInt
          if (cb > maxBg) maxBg = cb
        }
        prev = h
        first = false
        h = FNV_OFFSET
      } else {
        h = (h ^ (b & 0xff)) * FNV_PRIME
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, nTypes, maxTok, nBg, maxBg))
  }
}

/** `rep_stats(text)` — struct of single-pass repetition counters. */
case class RepStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepStatsKernel.schema
  override def prettyName: String = "rep_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  override def nullSafeEval(input: Any): Any =
    RepStatsKernel.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepStatsKernel.compute($c);")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object RepStats {
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("rep_stats")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "rep_stats", exprs => RepStats(exprs.head), "built-in")
}
