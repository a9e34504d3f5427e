package graft.util

/** Minimal JSON string writer shared by the audit-log sink and Verify's
  * oracle dump: exception messages, table names, and builder-authored SQL can
  * carry quotes/backslashes/newlines, which raw interpolation would turn into
  * malformed JSONL.
  */
object JsonUtil {
  /** `s` as a quoted JSON string literal, all mandatory escapes applied. */
  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"')
    b.toString
  }
}
