package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The OUTFILE unescape byte walk as a static JVM kernel + a
  * codegen'd Catalyst expression (reference: executor/load_data.go:905
  * field.escape — the sequential inverse scan of select_into.go:91
  * escapeField). The grammar is byte-oriented: the escape char is
  * ASCII `\` (0x5C), which can never appear inside a UTF-8
  * continuation byte, so the byte walk is exactly the reference's
  * char walk — letter escapes `\0 \b \n \r \t \Z` map to their
  * control bytes, the default branch drops the escape byte and keeps
  * the next byte verbatim (multi-byte sequences pass through intact:
  * the lead byte is "kept", continuations copy on the non-escape
  * branch), and a trailing lone escape byte is kept as-is.
  *
  * Shaped like [[Zlib]]/[[DotProduct]]: one kernel invoked from both
  * the interpreted path and a one-call `doGenCode`, so the LOAD
  * projection stays inside WholeStageCodegen — this replaced the
  * repo's only Scala UDF, whose opaque eval fenced the loader's
  * projection out of codegen.
  */
object OutfileText {

  /** Unescape one field. Escape-free inputs (the overwhelmingly
    * common row) return the INPUT UTF8String — zero allocation, one
    * byte scan. */
  def unescape(s: UTF8String): UTF8String = {
    if (s == null) return null
    val in = s.getBytes
    var i = 0
    var hasEsc = false
    while (i < in.length && !hasEsc) {
      if (in(i) == '\\') hasEsc = true
      i += 1
    }
    if (!hasEsc) return s
    val out = new Array[Byte](in.length)
    var o = 0
    i = 0
    while (i < in.length) {
      val b = in(i)
      if (b == '\\' && i + 1 < in.length) {
        val n = in(i + 1)
        out(o) =
          if (n == '0') 0x00.toByte
          else if (n == 'b') 0x08.toByte
          else if (n == 'n') 0x0a.toByte
          else if (n == 'r') 0x0d.toByte
          else if (n == 't') 0x09.toByte
          else if (n == 'Z') 0x1a.toByte
          else n
        o += 1
        i += 2
      } else {
        out(o) = b
        o += 1
        i += 1
      }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}

case class OutfileUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unescape"
  override def nullSafeEval(v: Any): Any =
    OutfileText.unescape(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.OutfileText.unescape($c);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}
