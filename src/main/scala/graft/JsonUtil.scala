package graft

/** Minimal JSON string escaping for the evidence mains' hand-rolled
  * output lines (no JSON library on the unmanaged classpath). Control
  * characters matter in practice: Spark AnalysisException messages are
  * multi-line, and a raw newline inside a JSON string both breaks
  * validity and splits the driver's last-line-of-stdout parse.
  */
object JsonUtil {

  /** Current commit SHA, read from .git directly (no subprocess) —
    * stamps evidence artifacts so a fresh run is distinguishable from
    * an edit of the committed file. */
  def gitHead(repoRoot: String = "."): String = try {
    import java.nio.file.{Files, Paths}
    val head = Files.readString(Paths.get(repoRoot, ".git", "HEAD")).trim
    if (head.startsWith("ref: ")) {
      val refPath = Paths.get(repoRoot, ".git", head.drop(5))
      if (Files.exists(refPath)) Files.readString(refPath).trim
      else { // packed refs
        Files.readAllLines(Paths.get(repoRoot, ".git", "packed-refs"))
          .stream().filter(_.endsWith(head.drop(5)))
          .findFirst().map[String](_.split(" ")(0)).orElse("unknown")
      }
    } else head
  } catch { case _: Exception => "unknown" }

  def nowIso(): String =
    java.time.Instant.now().toString

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
