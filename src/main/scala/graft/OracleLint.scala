package graft

/** Static type-discipline gate over the DuckDB oracle SQL.
  *
  * The one oracle failure class that ever reached the driver (round 10,
  * three queries): DuckDB types `sum(BIGINT)` — and in particular any
  * WINDOWED `sum(...) OVER (...)` — as HUGEINT (int128). Spark emits
  * BIGINT for the same expression, every VALUE is equal, the local
  * value-normalizing compare passes — and the driver's type-sensitive
  * hash fails. The fix is always the same one-liner: wrap the sum in
  * `CAST(... AS BIGINT)` (or consume it through a later cast).
  *
  * Rather than trace column lineage through CTEs to prove a given
  * windowed sum never reaches an output column untyped, the registry
  * adopts the stricter-but-trivially-checkable convention: EVERY
  * windowed `sum(...) OVER` in oracle SQL must sit inside an enclosing
  * `CAST(...)` at its use site, even when a downstream cast would have
  * saved it. The lint enforces exactly that convention; `Verify.main`
  * runs it before dumping so an uncast windowed sum can never ship to
  * the driver again (it also costs nothing: string scan, no DuckDB).
  *
  * Scope note: plain (non-windowed) integer sums are ALSO HUGEINT in
  * DuckDB, but they appear in boolean HAVING contexts and decimal
  * money sums throughout the registry where the convention would
  * false-positive; the driver-proven bite class is the windowed form,
  * and the exact 1:1 dtype gate for everything else lives in the
  * verify-skill DuckDB compare (which fetches real result types).
  */
object OracleLint {

  /** All violations across a map of oracle SQL (query name → SQL). */
  def violations(oracles: Map[String, String]): Seq[String] =
    oracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      uncastWindowedSums(sql).map { pos =>
        val ctx = sql.slice(math.max(0, pos - 20), math.min(sql.length, pos + 60))
          .replaceAll("\\s+", " ")
        s"$name: uncast windowed sum at offset $pos: …$ctx…"
      }
    }

  /** Offsets of windowed `sum(...) OVER` occurrences in `sql` that have
    * no enclosing `CAST(` anywhere on their open-paren stack. Quoted
    * string literals are opaque to the scan (a regex literal with a
    * paren must not desync the balance).
    */
  def uncastWindowedSums(sql: String): Seq[Int] = {
    val s = sql
    val n = s.length
    // Pre-compute, per character, whether it is inside a single-quoted
    // SQL string (DuckDB escapes a quote by doubling it, which this
    // flip-flop scan handles naturally: the closing quote of '' flips
    // back in immediately).
    val inStr = new Array[Boolean](n)
    var quoted = false
    var i = 0
    while (i < n) {
      if (s(i) == '\'') quoted = !quoted
      inStr(i) = quoted || s(i) == '\''
      i += 1
    }
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    // Stack of open-paren positions with the identifier preceding each.
    val openers = scala.collection.mutable.Stack[String]()
    val out = scala.collection.mutable.Buffer[Int]()
    i = 0
    while (i < n) {
      if (inStr(i)) i += 1
      else if (s(i) == '(') {
        var e = i - 1
        while (e >= 0 && s(e).isWhitespace) e -= 1
        var b = e
        while (b >= 0 && isWordChar(s(b))) b -= 1
        openers.push(s.substring(b + 1, e + 1).toLowerCase)
        i += 1
      } else if (s(i) == ')') {
        if (openers.nonEmpty) openers.pop()
        i += 1
      } else if ((s(i) == 's' || s(i) == 'S') &&
                 s.regionMatches(true, i, "sum", 0, 3) &&
                 (i == 0 || !isWordChar(s(i - 1)))) {
        // Candidate `sum` token: require `( args )` then `over`.
        var j = i + 3
        while (j < n && s(j).isWhitespace) j += 1
        if (j < n && s(j) == '(') {
          var depth = 0
          var k = j
          var ok = false
          while (k < n && !ok) {
            if (!inStr(k)) {
              if (s(k) == '(') depth += 1
              else if (s(k) == ')') { depth -= 1; if (depth == 0) ok = true }
            }
            k += 1
          }
          var m = k
          while (m < n && s(m).isWhitespace) m += 1
          val windowed = ok && s.regionMatches(true, m, "over", 0, 4) &&
            (m + 4 >= n || !isWordChar(s(m + 4)))
          if (windowed && !openers.contains("cast")) out += i
          // Resume INSIDE the sum args: a nested windowed sum inside
          // another sum's arguments would otherwise be skipped.
          i = j
        } else i += 3
      } else i += 1
    }
    out.toSeq
  }
}
