package graft.util

/** The repo's single JSON string-escape rule — shared by every
  * hand-authored JSON emitter (Verify's oracle/error manifests, Plot's
  * figure documents) so an escaping fix lands once. Escapes backslash,
  * quote, and ALL control chars below 0x20: a tab or CR in
  * builder-authored SQL would otherwise make a consumer's `json.load`
  * fail and silently zero whatever gate reads it.
  */
object Json {

  /** Escape and double-quote `s` as a JSON string literal. */
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
