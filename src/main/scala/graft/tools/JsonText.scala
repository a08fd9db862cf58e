package graft.tools

/** The one JSON string escaper shared by every hand-assembled JSON
  * emitter (Verify's oracle/failed dumps, PlanReplayer's bundle):
  * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
  * an interpolated value would otherwise break the consumer's
  * json.load. One definition, so an escaping fix can never apply to
  * one emitter and silently miss another.
  */
object JsonText {
  def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** `esc` wrapped in double quotes — a complete JSON string token. */
  def quote(s: String): String = "\"" + esc(s) + "\""
}
