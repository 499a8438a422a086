package graft.util

/** Minimal JSON string escaping shared by the driver-contract dumps
  * and the pipeline response envelope (one escaper, one set of
  * rules): backslash, quote, and ALL control chars < 0x20 — a tab or
  * CR in authored SQL or an error message must not break a consumer's
  * JSON parse. */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
