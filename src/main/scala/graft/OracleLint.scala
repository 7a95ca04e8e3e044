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
  * Rather than trace column lineage through CTEs to prove a given sum
  * never reaches an output column untyped, the registry adopts
  * stricter-but-trivially-checkable conventions, enforced here (string
  * scan, no DuckDB, runs in `Verify.main` before every dump):
  *
  *  1. EVERY windowed `sum(...) OVER` must sit inside an enclosing
  *     `CAST(...)` at its use site, even when a downstream cast would
  *     have saved it ([[uncastWindowedSums]] — the round-10 class).
  *  2. Every plain `sum(...)` in the FINAL top-level SELECT's
  *     projection — the columns the driver actually hashes — must be
  *     cast at site: an enclosing `CAST(...)`, a postfix `::type`, or
  *     an enclosing `round(...)` (principled exemption: DuckDB's
  *     `round` returns DOUBLE for any integer input and DECIMAL for
  *     DECIMAL — it can never emit HUGEINT, measured)
  *     ([[uncastFinalSelectSums]]). An uncast CTE sum can ALSO reach
  *     the output as a bare alias reference the sum rule never sees
  *     (`WITH a AS (SELECT sum(c) AS s …) SELECT s FROM a`) —
  *     [[uncastSumAliasPassthrough]] closes that hole: the alias of
  *     any directly-aliased uncast plain sum must itself be cast at
  *     site wherever it appears as a REFERENCE in the final projection
  *     (a declaration alias — the word after AS — is not a reference:
  *     `CAST(s AS BIGINT) AS s` is the house fix form), and a
  *     top-level projection STAR (`SELECT * FROM cte`, `cte.*`) flags
  *     whenever any hazard alias exists — it passes every CTE column
  *     through untyped where no word token would ever match. One level
  *     of aliasing only (an alias-of-an-alias is not traced) — the
  *     registry convention is to cast at the sum, which every rule
  *     here accepts.
  *  3. No `round(...)` whose FIRST argument contains a division — the
  *     cross-engine float-determinism rule (CLAUDE.md): `round` of a
  *     raw rational at a .5-grid boundary depends on the engine's
  *     decimal-repr strategy (measured: `round(41/640., 6)` differs
  *     DuckDB vs Spark); rationals must go through the floor-based
  *     `Quant.q6`/`Quant.r6` grids instead. Decimal-grid money sums
  *     (`round(sum(price), 2)`) carry no division and stay legal
  *     ([[roundOnRational]]).
  *
  * On a UNION of top-level selects, rule 2 checks the LAST branch only
  * (partial coverage, still insurance — the registry has none today).
  */
object OracleLint {

  /** All violations across a map of oracle SQL (query name → SQL). */
  def violations(oracles: Map[String, String]): Seq[String] =
    oracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      def ctx(pos: Int) = sql
        .slice(math.max(0, pos - 20), math.min(sql.length, pos + 60))
        .replaceAll("\\s+", " ")
      uncastWindowedSums(sql).map(p =>
        s"$name: uncast windowed sum at offset $p: …${ctx(p)}…") ++
      uncastFinalSelectSums(sql).map(p =>
        s"$name: uncast plain sum in the final SELECT at offset $p: …${ctx(p)}…") ++
      uncastSumAliasPassthrough(sql).map(p =>
        s"$name: uncast-sum alias passed bare through the final SELECT at offset $p: …${ctx(p)}…") ++
      roundOnRational(sql).map(p =>
        s"$name: round() over a division (use Quant.q6/r6) at offset $p: …${ctx(p)}…")
    }

  /** Per-character mask: inside a single-quoted SQL string literal OR a
    * `--` line comment. DuckDB escapes a quote by doubling it, which
    * the string branch handles naturally (the closing quote of ''
    * immediately re-opens). Quote characters themselves are masked too
    * (a paren inside a regex literal must not desync any balance scan).
    *
    * Comments MUST be masked alongside strings: a lone apostrophe in an
    * English comment ("piiScrub's") would otherwise invert the string
    * mask for the rest of the statement — blinding every rule after it
    * and desyncing the paren walks (found live in the registry; the
    * scanners all consume this one mask, so the fix lives here once).
    * A `--` inside a string literal is string content, and an
    * apostrophe inside a comment never opens a string.
    *
    * Double-quoted IDENTIFIERS get the same treatment (with `""` as the
    * escaped quote): an apostrophe or `--` inside a "quoted identifier"
    * (`"user"` is live in the registry) would otherwise open a phantom
    * string/comment mask — the exact failure class the comment branch
    * fixed. The identifier TEXT is masked like string content; the
    * rules only need to know it isn't scannable SQL.
    */
  private def stringMask(s: String): Array[Boolean] = {
    val masked = new Array[Boolean](s.length)
    var i = 0
    def maskQuoted(q: Char): Unit = {
      masked(i) = true
      i += 1
      while (i < s.length && s(i) != q) { masked(i) = true; i += 1 }
      if (i < s.length) { masked(i) = true; i += 1 }
      // A doubled quote is an escape: the closing quote above re-opens
      // on the next loop iteration, which is exactly the resume point.
    }
    while (i < s.length) {
      if (s(i) == '\'') maskQuoted('\'')
      else if (s(i) == '"') maskQuoted('"')
      else if (s(i) == '-' && i + 1 < s.length && s(i + 1) == '-') {
        while (i < s.length && s(i) != '\n') { masked(i) = true; i += 1 }
      } else i += 1
    }
    masked
  }

  private def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'

  /** Offsets of windowed `sum(...) OVER` occurrences in `sql` that are
    * not cast at site: no enclosing `CAST(` anywhere on their open-paren
    * stack AND no postfix `::` cast after the window spec (a postfix at
    * the use site IS a cast-at-site, same convention rule 2 accepts —
    * flagging `sum(x) OVER (...)::BIGINT` was a false positive that
    * bricked the gate on a correctly typed form).
    */
  def uncastWindowedSums(sql: String): Seq[Int] =
    scanSums(sql, 0, sql.length).collect {
      case h if h.windowed && !h.postfixCast &&
        !h.openers.contains("cast") => h.pos
    }

  /** Offsets of PLAIN (non-windowed) `sum(` occurrences inside the final
    * top-level SELECT's projection list that are not cast at site: no
    * enclosing `CAST(` or `round(` on the paren stack and no postfix
    * `::` cast after the closing paren.
    */
  def uncastFinalSelectSums(sql: String): Seq[Int] = {
    val (lo, hi) = finalSelectSpan(sql)
    scanSums(sql, lo, hi).collect {
      case h if !h.windowed && !h.postfixCast &&
        !h.openers.contains("cast") && !h.openers.contains("round") => h.pos
    }
  }

  /** Offsets of bare FINAL-projection references to an alias that names
    * an uncast plain sum somewhere in the statement — the passthrough
    * form rule 2's sum scan cannot see. A reference is "cast at site"
    * under the same convention as the sums themselves: enclosing
    * `CAST`/`round` or a postfix `::`.
    */
  def uncastSumAliasPassthrough(sql: String): Seq[Int] = {
    val hazards = scanSums(sql, 0, sql.length).collect {
      case h if !h.windowed && !h.postfixCast &&
        !h.openers.contains("cast") && !h.openers.contains("round") =>
        h.alias
    }.flatten.map(_.toLowerCase).toSet
    if (hazards.isEmpty) return Seq.empty
    val (lo, hi) = finalSelectSpan(sql)
    val s = sql
    val n = s.length
    val inStr = stringMask(s)
    val openers = scala.collection.mutable.Stack[String]()
    val out = scala.collection.mutable.Buffer[Int]()
    var i = 0
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
      } else if (s(i) == '*') {
        // A top-level projection STAR in the final span (`SELECT * FROM
        // cte` / `cte.*`) passes EVERY CTE column through untyped —
        // including the hazard aliases this rule exists to trace, which
        // the bare-word scan below can never see (no word token ever
        // matches). Distinguish from multiplication by the preceding
        // token: a star right after the span start, a comma, or a dot
        // is a projection; after an operand it is arithmetic. count(*)
        // sits inside parens (openers non-empty) and is skipped.
        if (i >= lo && i < hi && openers.isEmpty) {
          var p = i - 1
          while (p >= lo && s(p).isWhitespace) p -= 1
          // A star after the DISTINCT/ALL set quantifier is a
          // projection star too (`SELECT DISTINCT * FROM cte` — the
          // word-token rule below read it as arithmetic and the hazard
          // passthrough went unflagged, review-caught).
          def prevWordIn(ws: Set[String]): Boolean = {
            if (p < lo || !isWordChar(s(p))) return false
            var b2 = p
            while (b2 >= lo && isWordChar(s(b2))) b2 -= 1
            ws.contains(s.substring(b2 + 1, p + 1).toLowerCase)
          }
          if (p < lo || s(p) == ',' || s(p) == '.' ||
              prevWordIn(Set("distinct", "all"))) out += i
        }
        i += 1
      } else if (isWordChar(s(i))) {
        val b = i
        while (i < n && isWordChar(s(i))) i += 1
        val word = s.substring(b, i).toLowerCase
        // Whitespace allowed before the postfix cast, exactly like
        // scanSums' check — the two scans must accept the same forms
        // (`s ::BIGINT` once passed the sum rule but false-positived
        // here).
        var w = i
        while (w < n && s(w).isWhitespace) w += 1
        val postfix = w + 1 < n && s(w) == ':' && s(w + 1) == ':'
        // A DECLARATION alias — the word directly after an `AS` keyword
        // — is not a reference: `CAST(s AS BIGINT) AS s` re-aliases in
        // the registry's house style (the value flowing out is the cast
        // expression), and flagging the declared NAME would brick the
        // gate on its own documented fix form.
        var p = b - 1
        while (p >= 0 && s(p).isWhitespace) p -= 1
        val isDecl = p >= 1 &&
          s.regionMatches(true, p - 1, "as", 0, 2) &&
          (p - 2 < 0 || !isWordChar(s(p - 2)))
        if (b >= lo && b < hi && hazards(word) && !postfix && !isDecl &&
            !openers.contains("cast") && !openers.contains("round"))
          out += b
      } else i += 1
    }
    out.toSeq
  }

  /** Offsets of `round(` occurrences whose first argument contains a
    * division operator outside string literals.
    */
  def roundOnRational(sql: String): Seq[Int] = {
    val s = sql
    val n = s.length
    val inStr = stringMask(s)
    val out = scala.collection.mutable.Buffer[Int]()
    var i = 0
    while (i < n) {
      if (!inStr(i) && s.regionMatches(true, i, "round", 0, 5) &&
          (i == 0 || !isWordChar(s(i - 1))) &&
          (i + 5 >= n || !isWordChar(s(i + 5)))) {
        var j = i + 5
        while (j < n && s(j).isWhitespace) j += 1
        if (j < n && s(j) == '(') {
          // Walk the balanced call; note the first depth-1 comma (end of
          // the first argument) and any division before it.
          var depth = 0
          var k = j
          var firstComma = -1
          var done = false
          while (k < n && !done) {
            if (!inStr(k)) {
              if (s(k) == '(') depth += 1
              else if (s(k) == ')') { depth -= 1; if (depth == 0) done = true }
              else if (s(k) == ',' && depth == 1 && firstComma < 0) firstComma = k
            }
            k += 1
          }
          val argEnd = if (firstComma >= 0) firstComma else k - 1
          var d = j + 1
          var hasDiv = false
          while (d < argEnd && !hasDiv) {
            if (!inStr(d) && s(d) == '/') hasDiv = true
            d += 1
          }
          if (hasDiv) out += i
          // Resume INSIDE the args: a nested round inside this round's
          // arguments must still be visited.
          i = j + 1
        } else i += 5
      } else i += 1
    }
    out.toSeq
  }

  /** `(start, end)` of the last top-level (paren-depth-0) SELECT's
    * projection list — from just past its `SELECT` keyword to its
    * depth-0 `FROM` (or end of string for a FROM-less select).
    * `(0, 0)` when the SQL has no top-level SELECT at all.
    *
    * Two silent-truncation holes closed (review-caught, both made
    * rules 2/2b check NOTHING): a fully parenthesized statement
    * `(SELECT ...)` has no depth-0 SELECT — matched outer paren layers
    * are stripped first; and the `FROM` inside `IS [NOT] DISTINCT
    * FROM` is an operator token, not the projection terminator — a
    * FROM whose preceding word is `distinct` does not close the span.
    */
  private[graft] def finalSelectSpan(sql: String): (Int, Int) = {
    val s = sql
    val inStr = stringMask(s)
    // Strip matched WRAPPING paren layers so the interior scans at its
    // own depth 0.
    var lo0 = 0
    var hi0 = s.length
    var stripped = true
    while (stripped) {
      stripped = false
      var a = lo0
      while (a < hi0 && s(a).isWhitespace) a += 1
      var b = hi0 - 1
      while (b > a && s(b).isWhitespace) b -= 1
      if (a < b && s(a) == '(' && !inStr(a) && s(b) == ')' && !inStr(b)) {
        var d = 0
        var i = a
        var matchAt = -1
        while (i <= b && matchAt < 0) {
          if (!inStr(i)) {
            if (s(i) == '(') d += 1
            else if (s(i) == ')') { d -= 1; if (d == 0) matchAt = i }
          }
          i += 1
        }
        if (matchAt == b) { lo0 = a + 1; hi0 = b; stripped = true }
      }
    }
    val n = hi0
    var depth = 0
    var i = lo0
    var cur = -1
    var last = (0, 0)
    def kw(at: Int, w: String) =
      s.regionMatches(true, at, w, 0, w.length) &&
        (at == 0 || !isWordChar(s(at - 1))) &&
        (at + w.length >= n || !isWordChar(s(at + w.length)))
    def prevWordIs(at: Int, w: String): Boolean = {
      var p = at - 1
      while (p >= lo0 && s(p).isWhitespace) p -= 1
      val e = p
      while (p >= lo0 && isWordChar(s(p))) p -= 1
      e > p && s.regionMatches(true, p + 1, w, 0, w.length) &&
        (e - p) == w.length
    }
    while (i < n) {
      if (inStr(i)) i += 1
      else s(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ if depth == 0 && kw(i, "select") =>
          cur = i + 6; i += 6
        case _ if depth == 0 && cur >= 0 && kw(i, "from") &&
            !prevWordIs(i, "distinct") =>
          last = (cur, i); cur = -1; i += 4
        case _ => i += 1
      }
    }
    if (cur >= 0) last = (cur, n)
    last
  }

  private case class SumHit(pos: Int, openers: List[String],
      windowed: Boolean, postfixCast: Boolean,
      alias: Option[String] = None)

  /** Every `sum( … )` call whose `sum` token lies in `[lo, hi)`, with
    * the identifiers owning each enclosing open paren (lowercased; the
    * stack is built from the start of the string so an enclosing
    * `CAST(` opened before `lo` still counts), whether the balanced
    * call is followed by `OVER`, and whether by a postfix `::` cast.
    * The scan resumes INSIDE each sum's arguments so nested sums are
    * visited too.
    */
  private def scanSums(sql: String, lo: Int, hi: Int): Seq[SumHit] = {
    val s = sql
    val n = s.length
    val inStr = stringMask(s)
    val openers = scala.collection.mutable.Stack[String]()
    val out = scala.collection.mutable.Buffer[SumHit]()
    var i = 0
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
        // Candidate `sum` token: require `( args )` then classify.
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
          // Optional aggregate FILTER clause between the call and OVER:
          // `sum(x) FILTER (WHERE ...) OVER (...)` is still a windowed
          // sum (and DuckDB still types it HUGEINT) — skip the balanced
          // FILTER group so the OVER/alias/postfix checks see past it.
          if (ok && s.regionMatches(true, m, "filter", 0, 6) &&
              (m + 6 >= n || !isWordChar(s(m + 6)))) {
            var f = m + 6
            while (f < n && s(f).isWhitespace) f += 1
            if (f < n && s(f) == '(') {
              var fd = 0
              var k2 = f
              var fok = false
              while (k2 < n && !fok) {
                if (!inStr(k2)) {
                  if (s(k2) == '(') fd += 1
                  else if (s(k2) == ')') { fd -= 1; if (fd == 0) fok = true }
                }
                k2 += 1
              }
              if (fok) {
                m = k2
                while (m < n && s(m).isWhitespace) m += 1
              }
            }
          }
          val windowed = ok && s.regionMatches(true, m, "over", 0, 4) &&
            (m + 4 >= n || !isWordChar(s(m + 4)))
          // For a windowed sum the use site ends AFTER the window spec
          // (parenthesized or a named window) — a postfix `::` there is
          // a cast-at-site exactly like the plain-sum form.
          if (windowed) {
            m += 4
            while (m < n && s(m).isWhitespace) m += 1
            if (m < n && s(m) == '(') {
              var wd = 0
              var k3 = m
              var wok = false
              while (k3 < n && !wok) {
                if (!inStr(k3)) {
                  if (s(k3) == '(') wd += 1
                  else if (s(k3) == ')') { wd -= 1; if (wd == 0) wok = true }
                }
                k3 += 1
              }
              if (wok) m = k3
            } else {
              while (m < n && isWordChar(s(m))) m += 1 // named window
            }
            while (m < n && s(m).isWhitespace) m += 1
          }
          val postfix = ok && m + 1 < n && s(m) == ':' && s(m + 1) == ':'
          // Direct `AS word` after the balanced call (the only aliasing
          // form the registry uses for sums).
          val alias =
            if (ok && s.regionMatches(true, m, "as", 0, 2) &&
                m + 2 < n && s(m + 2).isWhitespace) {
              var a = m + 2
              while (a < n && s(a).isWhitespace) a += 1
              var b2 = a
              while (b2 < n && isWordChar(s(b2))) b2 += 1
              if (b2 > a) Some(s.substring(a, b2)) else None
            } else None
          if (i >= lo && i < hi)
            out += SumHit(i, openers.toList, windowed, postfix, alias)
          // Resume INSIDE the sum args: a nested sum inside another
          // sum's arguments would otherwise be skipped.
          i = j
        } else i += 3
      } else i += 1
    }
    out.toSeq
  }
}
