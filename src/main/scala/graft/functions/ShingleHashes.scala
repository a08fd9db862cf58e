package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle hashing kernel for the dedup suite.
  *
  * The sketching pipelines (MinHash, n-gram Jaccard) need
  * `xxhash64(shingle)` for every character/word n-gram of a document.
  * The declarative formulation materialises each shingle as a string
  * (`transform(sequence(...), i -> substring(...))` /
  * `concat_ws(' ', slice(toks, ...))`) before hashing it — per-row
  * allocation of hundreds of small strings through interpreted
  * higher-order lambdas, ~12 s of the sf0.1 bench. These kernels
  * hash the exact same UTF-8 byte windows in place with Spark's own
  * XXH64 (seed 42, identical to the `xxhash64` builtin on strings),
  * so every downstream signature is bit-identical while doing zero
  * string allocation.
  *
  * Reference analog: tigraph/tidb's vectorized hash kernels
  * (expression/builtin_encryption_vec.go) hash column chunks in
  * place rather than routing through interpreted expression trees.
  */
object ShingleHashKernel {
  private final val Seed = 42L

  /** Hashes of all `n`-code-point windows (the byte-identical analog
    * of `xxhash64(substring(text, i, n))`). Texts shorter than `n`
    * code points yield an empty array. */
  def charShingles(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // Byte offsets of each code-point start (+ end sentinel).
    val starts = new Array[Int](s.numChars() + 1)
    var i = 0
    var cp = 0
    while (i < len) {
      val b = Platform.getByte(base, off + i)
      if ((b & 0xc0) != 0x80) { starts(cp) = i; cp += 1 }
      i += 1
    }
    starts(cp) = len
    if (cp < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](cp - n + 1)
    var j = 0
    while (j + n <= cp) {
      out(j) = XXH64.hashUnsafeBytes(base, off + starts(j),
        starts(j + n) - starts(j), Seed)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Hashes of all word `n`-grams, where words are maximal `\S+` runs
    * joined by a single space — byte-identical to
    * `xxhash64(concat_ws(' ', slice(tokens, i, n)))`. */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // Token [start, end) byte ranges.
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    var inTok = false
    while (i < len) {
      val b = Platform.getByte(base, off + i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
        b == '\f' || b == '\r'
      if (!isWs && !inTok) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = i
        inTok = true
      } else if (isWs && inTok) {
        ends(nTok) = i; nTok += 1; inTok = false
      }
      i += 1
    }
    if (inTok) { ends(nTok) = len; nTok += 1 }
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nTok - n + 1)
    var buf = new Array[Byte](64)
    var j = 0
    while (j + n <= nTok) {
      var need = n - 1 // separator spaces
      var k = j
      while (k < j + n) { need += ends(k) - starts(k); k += 1 }
      if (buf.length < need) buf = new Array[Byte](need)
      var p = 0
      k = j
      while (k < j + n) {
        if (k > j) { buf(p) = ' '; p += 1 }
        Platform.copyMemory(base, off + starts(k), buf,
          Platform.BYTE_ARRAY_OFFSET + p, ends(k) - starts(k))
        p += ends(k) - starts(k)
        k += 1
      }
      out(j) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET,
        need, Seed)
      j += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashKernel {
  /** Fused MinHash signature: k running minima over
    * `XXH64.hashLong(shingleHash, perm)` maintained in ONE pass over
    * the char shingles — no exploded (doc, shingle) rows, no k
    * aggregate columns, no shuffle at all until banding. Texts with
    * no shingle yield an empty array (callers filter on size, the
    * analog of such docs vanishing from the exploded form). */
  def signature(s: UTF8String, n: Int, k: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    val starts = new Array[Int](s.numChars() + 1)
    var i = 0
    var cp = 0
    while (i < len) {
      val b = Platform.getByte(base, off + i)
      if ((b & 0xc0) != 0x80) { starts(cp) = i; cp += 1 }
      i += 1
    }
    starts(cp) = len
    if (cp < n) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j + n <= cp) {
      val h = XXH64.hashUnsafeBytes(base, off + starts(j),
        starts(j + n) - starts(j), 42L)
      var p = 0
      while (p < k) {
        val v = XXH64.hashLong(h, p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_signature(text)`: k-permutation MinHash over char
  * n-grams via [[MinHashKernel]]. */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[UTF8String], n, k)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.signature($c, $n, $k);")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SigAgreementKernel {
  /** Positions where two equal-length signature arrays agree. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** `sig_agreement(a, b)`: matching positions of two array<long>
  * signatures — the codegen replacement for the interpreted
  * `aggregate(zip_with(a, b, ...))` MinHash-agreement fold. */
case class SigAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sig_agreement"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreementKernel.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigAgreementKernel.count($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** `char_shingle_hashes(text)` / `word_shingle_hashes(text)` exprs
  * with a compile-time shingle width. */
abstract class ShingleHashExpr extends UnaryExpression {
  def n: Int
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
}

case class CharShingleHashes(child: Expression, n: Int)
    extends ShingleHashExpr {
  override def prettyName: String = "char_shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.charShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashKernel.charShingles($c, $n);")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

case class WordShingleHashes(child: Expression, n: Int)
    extends ShingleHashExpr {
  override def prettyName: String = "word_shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashKernel.wordShingles($c, $n);")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
