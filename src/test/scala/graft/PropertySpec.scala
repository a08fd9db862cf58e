package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks over the pure-JVM kernels — the code paths
  * where a hand-picked example can miss an edge (escaping, byte
  * offsets, normalization). No SparkSession involved.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  // --- Bindings.normalize ---------------------------------------

  private val noQuote =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\t', '\n', '(', ')',
        '=', '<', '>', ',', '.', '*'))).map(_.mkString)

  test("normalize is idempotent") {
    check(Prop.forAll(noQuote, noQuote) { (a, b) =>
      val s = s"$a'$b'$a"
      plans.Bindings.normalize(plans.Bindings.normalize(s)) ==
        plans.Bindings.normalize(s)
    }, "idempotence")
  }

  test("normalize preserves quoted literals verbatim") {
    // Whatever surrounds it, a quoted literal (no quotes/backslashes
    // inside) must appear unchanged in the normalized text — case,
    // runs of spaces, everything.
    val lit = Gen.listOf(Gen.frequency(6 -> Gen.alphaNumChar,
      2 -> Gen.const(' '), 1 -> Gen.const('\t'))).map(_.mkString)
    check(Prop.forAll(noQuote, lit, noQuote) { (pre, l, post) =>
      plans.Bindings.normalize(s"$pre'$l'$post")
        .contains(s"'$l'")
    }, "literal preservation")
  }

  test("normalize equates statements differing only outside literals") {
    check(Prop.forAll(noQuote) { s =>
      plans.Bindings.normalize(s"SELECT  $s") ==
        plans.Bindings.normalize(s"select $s")
    }, "case/ws equivalence")
  }

  // --- EntropyStatsKernel ---------------------------------------

  private val asciiText = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaChar, 2 -> Gen.const(' '), 1 -> Gen.numChar,
    1 -> Gen.oneOf('\t', '\n', '.', ','))).map(_.mkString)

  // Non-ASCII mix: multi-byte letters (Greek, CJK), a 4-byte
  // supplementary code point, uppercase with a non-ASCII simple
  // lowercase mapping (\u00c4, \u03a3), and NBSP which is a TOKEN
  // char (only ASCII whitespace splits).
  private val unicodeText = Gen.listOf(Gen.frequency(
    4 -> Gen.alphaChar.map(_.toString), 2 -> Gen.const(" "),
    3 -> Gen.oneOf("\u03b1", "\u03a3", "\u4e2d", "\u00c4", "\u00e9",
      "\u00a0", "\ud835\udd4a"),
    1 -> Gen.oneOf("\t", "\n", "\u000b"))).map(_.mkString)

  private def entropyBrute(s: String): (Int, Int, Double, Double) = {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def entropy(counts: Iterable[Int]): Double = {
      val n = counts.sum
      if (n == 0) 0.0
      else log2(n.toDouble) - counts.map(c => c * log2(c.toDouble)).sum / n
    }
    // Independent formulation of the PINNED semantics: simple
    // per-code-point lowercase, char histogram over CODE POINTS
    // (not UTF-8 bytes), tokens split on ASCII whitespace.
    val cps = s.codePoints().toArray.map(Character.toLowerCase)
    val lowered = new String(cps, 0, cps.length)
    // RE2's \s class ([\t\n\f\r ]): vertical tab is a TOKEN char.
    val toks = lowered.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val wc = toks.groupBy(identity).map(_._2.length)
    val cc = cps.groupBy(identity).map(x => x._2.length)
    (toks.length, wc.size, entropy(wc), entropy(cc))
  }

  private def entropyKernelMatches(s: String): Boolean = {
    val row = functions.EntropyStatsKernel.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val (nTok, nTyp, we, ce) = entropyBrute(s)
    row.getInt(0) == nTok && row.getInt(1) == nTyp &&
      math.abs(row.getDouble(2) - we) < 1e-9 &&
      math.abs(row.getDouble(3) - ce) < 1e-9
  }

  test("entropy kernel matches a brute-force recompute on random ASCII") {
    check(Prop.forAll(asciiText)(entropyKernelMatches _), "entropy kernel")
  }

  test("entropy kernel matches brute force on non-ASCII unicode") {
    check(Prop.forAll(unicodeText)(entropyKernelMatches _),
      "entropy kernel unicode")
  }

  test("entropy kernel never throws on arbitrary unicode") {
    check(Prop.forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('α', 'β', '中', '☃', ' ', '\n'))).map(_.mkString)) { s =>
      val row = functions.EntropyStatsKernel.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      row.getInt(0) >= row.getInt(1) && row.getInt(1) >= 0
    }, "unicode safety")
  }

  // --- SortedIntersectKernel ------------------------------------

  test("sorted-intersect merge walk equals the set intersection") {
    val sortedArr = Gen.listOf(Gen.choose(-500L, 500L))
      .map(_.distinct.sorted.toArray)
    check(Prop.forAll(sortedArr, sortedArr) { (a, b) =>
      val got = functions.SortedIntersectKernel.count(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b))
      got == a.toSet.intersect(b.toSet).size
    }, "sorted intersect")
  }

  // --- JsonShape kernels (via direct eval) ----------------------

  private def evalStr(e: org.apache.spark.sql.catalyst.expressions.Expression,
      s: String): Any =
    e.eval(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))

  private val jsonGen: Gen[String] = {
    val scalar = Gen.oneOf(
      Gen.choose(-1000, 1000).map(_.toString),
      Gen.alphaStr.map(s => "\"" + s + "\""),
      Gen.oneOf("true", "false", "null"))
    def tree(depth: Int): Gen[String] =
      if (depth <= 0) scalar
      else Gen.frequency(
        3 -> scalar,
        2 -> Gen.listOfN(2, tree(depth - 1))
          .map(_.mkString("[", ",", "]")),
        2 -> Gen.zip(Gen.alphaStr, tree(depth - 1), Gen.alphaStr,
          tree(depth - 1)).map { case (k1, v1, k2, v2) =>
            s"""{"$k1":$v1,"k_$k2":$v2}"""
          })
    tree(3)
  }

  test("minify ∘ pretty is identity on minified JSON") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    val ref = BoundReference(0, StringType, nullable = true)
    val minify = functions.JsonMinify(ref)
    val pretty = functions.JsonPretty(ref)
    check(Prop.forAll(jsonGen) { j =>
      val m1 = String.valueOf(evalStr(minify, j))
      val p = String.valueOf(evalStr(pretty, m1))
      String.valueOf(evalStr(minify, p)) == m1
    }, "pretty/minify round trip")
  }

  test("depth matches a reference recursion; trailing garbage is null") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    val ref = BoundReference(0, StringType, nullable = true)
    val depthE = functions.JsonDepth(ref)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def refDepth(n: com.fasterxml.jackson.databind.JsonNode): Int =
      if (!n.isContainerNode || n.isEmpty) 1
      else 1 + {
        val it = n.elements()
        var m = 0
        while (it.hasNext) m = math.max(m, refDepth(it.next()))
        m
      }
    check(Prop.forAll(jsonGen) { j =>
      evalStr(depthE, j) == refDepth(mapper.readTree(j)) &&
        evalStr(depthE, j + " [1]") == null
    }, "depth + strictness")
  }
}
