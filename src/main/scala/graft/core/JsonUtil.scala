package graft.core

/** JSON string-literal escaping shared by every hand-built JSON emitter
  * (Verify's oracle dump, the HTTP shim's error payloads): backslash,
  * quote, and ALL control chars (<0x20) — a tab or CR in builder-authored
  * SQL would otherwise emit invalid JSON downstream. */
object JsonUtil {
  def escape(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
