package graft

/** Minimal JSON string escaping for the evidence mains' hand-rolled
  * output lines (no JSON library on the unmanaged classpath). Control
  * characters matter in practice: Spark AnalysisException messages are
  * multi-line, and a raw newline inside a JSON string both breaks
  * validity and splits the driver's last-line-of-stdout parse.
  */
object JsonUtil {
  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"'  => b.append("\\\"")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }
}
