package graft

/** The ONE JSON string escape for every hand-emitted record (Bench's
  * stdout line, Verify's oracle_sql.json, the value digest). Escapes
  * backslash, quote, and ALL control chars (< 0x20) — one unescaped tab
  * or CR in builder-authored SQL would make the driver's `json.load`
  * fail and silently zero a round's correctness record. Three private
  * copies of this logic once existed; they can no longer diverge.
  */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
