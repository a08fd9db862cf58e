package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass lexical-entropy kernel for the t_entropy quality
  * signal (CCNet/Gopher-style: low word entropy = repetitive or
  * boilerplate text, low char entropy = degenerate byte soup; both
  * are standard pre-training corpus filters beside
  * [[TextStatsKernel]]'s ratio counters).
  *
  * Per document, ONE pass over the UTF-8 bytes builds a token
  * histogram (maximal `\S` runs, ASCII-lowercased — the same token
  * definition TextStats counts) and a 256-way byte histogram, then
  * returns struct(n_tokens, n_types, word_entropy, char_entropy)
  * with entropies in bits via H = log2(n) − Σ c·log2(c) / n — the
  * exact-integer-count form, so the only float work is log2 of
  * integers (matches DuckDB's `entropy` aggregate to well under the
  * 4dp at which the oracle compares).
  *
  * The per-row HashMap puts this on the CodegenFallback tier —
  * like the JSON shape family, the cost IS the histogram, which no
  * codegen removes; the win over the declarative spelling
  * (explode → two shuffled aggregations per doc) is that the whole
  * signal stays MAP-SIDE: at 100 TB the entropy column costs a scan,
  * not a (doc_id, token) exchange.
  *
  * Reference analog: fixed-function per-chunk kernels in
  * expression/builtin_string_vec.go.
  */
object EntropyStatsKernel {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_types", IntegerType, nullable = false),
    StructField("word_entropy", DoubleType, nullable = false),
    StructField("char_entropy", DoubleType, nullable = false)))

  private val LN2 = math.log(2.0)
  private def log2(x: Double): Double = math.log(x) / LN2

  private def entropyOf(counts: Iterator[Int], n: Int): Double =
    if (n == 0) 0.0
    else {
      var s = 0.0
      while (counts.hasNext) { val c = counts.next(); s += c * log2(c) }
      log2(n) - s / n
    }

  def compute(s: UTF8String): GenericInternalRow = {
    // ASCII-lowercase byte-wise (A-Z → a-z; every other byte,
    // including multi-byte UTF-8 sequences, passes through verbatim)
    // — locale-proof, and token slices are cut from the SAME byte
    // array they were scanned in, so non-ASCII input can never
    // misalign byte offsets against char offsets.
    val raw = s.getBytes
    val bytes = new Array[Byte](raw.length)
    var j = 0
    while (j < raw.length) {
      val b = raw(j)
      bytes(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      j += 1
    }
    val byteHist = new Array[Int](256)
    val tokens = new java.util.HashMap[String, Int]()
    var nTokens = 0
    var tokStart = -1
    def endToken(end: Int): Unit = if (tokStart >= 0) {
      val w = new String(bytes, tokStart, end - tokStart,
        java.nio.charset.StandardCharsets.UTF_8)
      tokens.merge(w, 1, (a, b) => a + b)
      nTokens += 1
      tokStart = -1
    }
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      byteHist(b) += 1
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
        b == '\f' || b == '\r'
      if (isWs) endToken(i)
      else if (tokStart < 0) tokStart = i
      i += 1
    }
    endToken(bytes.length)
    val it = tokens.values().iterator()
    val wordCounts = new Iterator[Int] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
    val we = entropyOf(wordCounts, nTokens)
    val ce = entropyOf(byteHist.iterator.filter(_ > 0), bytes.length)
    // Raw doubles out; the query rounds with Spark's round() so the
    // half-up semantics match DuckDB's round() exactly.
    new GenericInternalRow(Array[Any](nTokens, tokens.size(), we, ce))
  }
}

/** `graft_entropy_stats(text)` — struct of single-pass lexical
  * entropy stats (see [[EntropyStatsKernel]]). Null in → null out. */
case class EntropyStats(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = EntropyStatsKernel.schema
  override def prettyName: String = "graft_entropy_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    EntropyStatsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}
