package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** MySQL-layout zlib compression (reference:
  * expression/builtin_encryption.go COMPRESS / UNCOMPRESS /
  * UNCOMPRESSED_LENGTH): the compressed blob is a 4-byte
  * little-endian uncompressed-length header followed by the zlib
  * stream; ''-in → ''-out; UNCOMPRESS of a corrupt/short blob is
  * NULL (non-strict, one bad row can't kill a job).
  *
  * Shaped like [[DotProduct]]: a static JVM kernel invoked from both
  * the interpreted path and a one-call `doGenCode`, so the expression
  * stays inside WholeStageCodegen (the loop lives in the kernel, not
  * in interpreted expression-tree walks).
  */
object Zlib {
  def compress(in: Array[Byte]): Array[Byte] = {
    if (in.isEmpty) return Array.emptyByteArray
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    out.write(in.length & 0xFF)
    out.write((in.length >> 8) & 0xFF)
    out.write((in.length >> 16) & 0xFF)
    out.write((in.length >>> 24) & 0xFF)
    val d = new java.util.zip.Deflater()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def uncompress(in: Array[Byte]): Array[Byte] = {
    if (in.isEmpty) return Array.emptyByteArray
    if (in.length < 5) return null
    val n = (in(0) & 0xFF) | ((in(1) & 0xFF) << 8) |
      ((in(2) & 0xFF) << 16) | ((in(3) & 0xFF) << 24)
    if (n < 0) return null
    val inf = new java.util.zip.Inflater()
    inf.setInput(in, 4, in.length - 4)
    val out = new Array[Byte](n)
    try {
      var off = 0
      while (!inf.finished() && off < n) {
        val k = inf.inflate(out, off, n - off)
        if (k == 0 && inf.needsInput()) return null
        off += k
      }
      if (off == n) out else null
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }
}

case class ZlibCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_compress"
  override def nullSafeEval(v: Any): Any =
    Zlib.compress(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Zlib.compress($c);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

case class ZlibUncompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_uncompress"
  override def nullSafeEval(v: Any): Any =
    Zlib.uncompress(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Zlib.uncompress($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}
