package graft

/** The ONE JSON string escaper every driver-contract emitter shares
  * (Bench's metric line, Verify's oracle_sql.json). Two hand-rolled
  * copies guarded the same driver-side json.load and had already
  * drifted cosmetically — a future escaping fix applied to one would
  * leave the other emitting the unparseable byte, the parsed:null
  * failure both files exist to fight.
  */
private[graft] object Json {
  /** Quote + escape: backslash, quote, and ALL control chars (<0x20) —
    * a tab or CR in builder-authored SQL (or a path) would otherwise
    * break the driver's parse and silently zero the round's results.
    */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
