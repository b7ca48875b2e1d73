package graft.format

/** Minimal JSON string escaping, shared by every place that hand-writes JSON
  * (the Verify oracle dump, the Telegram sink). One implementation so the
  * escape rules cannot drift: backslash, quote, and ALL control chars < 0x20.
  */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `"escaped"` — the escaped string in quotes. */
  def str(s: String): String = "\"" + escape(s) + "\""
}
