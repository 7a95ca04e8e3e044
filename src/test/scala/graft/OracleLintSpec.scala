package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle type-discipline gate (round-10 HUGEINT lesson) plus the
  * query-set regression watch (round-7 vanishing-queries lesson) — both
  * pure functions, no Spark session needed.
  */
class OracleLintSpec extends AnyFunSuite {

  test("every registered oracle passes the windowed-sum cast lint") {
    val hits = OracleLint.violations(SparkEntry.oracleSql)
    assert(hits.isEmpty, hits.mkString("\n"))
  }

  test("an injected uncast windowed sum is caught") {
    // The exact round-10 failure shape: integer division by an uncast
    // windowed sum — DuckDB types the result HUGEINT, the driver's
    // type-sensitive hash diverges from Spark's BIGINT.
    val bad = "SELECT cnt * 1000000 // sum(cnt) OVER (PARTITION BY k) " +
      "AS ppm FROM t"
    assert(OracleLint.uncastWindowedSums(bad).nonEmpty)
    assert(OracleLint.violations(Map("q" -> bad)).exists(_.startsWith("q:")))
  }

  test("a CAST-wrapped windowed sum is clean, nested or not") {
    val ok1 = "SELECT CAST(sum(cnt) OVER (PARTITION BY k) AS BIGINT) FROM t"
    val ok2 = "SELECT CAST(coalesce(sum(cnt) OVER (ORDER BY d " +
      "RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) FROM t"
    val ok3 = "SELECT CAST(a * 100 // sum(cnt) OVER (PARTITION BY k) " +
      "AS BIGINT) FROM t"
    assert(OracleLint.uncastWindowedSums(ok1).isEmpty)
    assert(OracleLint.uncastWindowedSums(ok2).isEmpty)
    assert(OracleLint.uncastWindowedSums(ok3).isEmpty)
  }

  test("plain aggregate sums are out of scope; only the OVER form flags") {
    val plain = "SELECT l_orderkey FROM lineitem GROUP BY 1 " +
      "HAVING sum(l_quantity) > 250"
    assert(OracleLint.uncastWindowedSums(plain).isEmpty)
  }

  test("quoted string literals cannot desync the paren balance") {
    // A regex literal with an unbalanced paren before an uncast windowed
    // sum: the scan must still flag it (and not crash or mis-nest).
    val s = "SELECT regexp_extract(t, '([a-z]') AS x, " +
      "sum(c) OVER (PARTITION BY k) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(s).nonEmpty)
    // …and a cast one inside the same statement stays clean.
    val s2 = "SELECT regexp_extract(t, '([a-z]') AS x, " +
      "CAST(sum(c) OVER (PARTITION BY k) AS BIGINT) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(s2).isEmpty)
  }

  test("identifiers merely ending in 'sum' do not trigger the scan") {
    val s = "SELECT checksum(c) OVER (PARTITION BY k) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(s).isEmpty)
  }

  test("an injected uncast plain sum in the final SELECT is caught") {
    // The widened round-11 class: a plain sum(BIGINT) emitted directly
    // as an output column — DuckDB widens to HUGEINT, the driver's
    // type-sensitive hash diverges.
    val bad = "WITH t AS (SELECT 1 AS c) SELECT k, sum(c) AS n FROM t GROUP BY k"
    assert(OracleLint.uncastFinalSelectSums(bad).nonEmpty)
    assert(OracleLint.violations(Map("q" -> bad))
      .exists(v => v.startsWith("q:") && v.contains("final SELECT")))
  }

  test("final-select sums cast at site are clean: CAST, postfix ::, round") {
    val ok1 = "SELECT CAST(sum(c) AS BIGINT) AS n FROM t GROUP BY k"
    val ok2 = "SELECT sum(c)::DOUBLE / count(*)::DOUBLE AS m FROM t"
    val ok3 = "SELECT round(sum(price), 2) AS total FROM t" // round never emits HUGEINT (measured: DOUBLE/DECIMAL)
    val ok4 = "SELECT CAST(x * 100 // sum(c) AS BIGINT) AS ppm FROM t"
    for (s <- Seq(ok1, ok2, ok3, ok4))
      assert(OracleLint.uncastFinalSelectSums(s).isEmpty, s)
  }

  test("intermediate CTE sums are out of rule-2 scope; only the final SELECT's projection flags") {
    // The uncast sum lives in a CTE (consumed through a cast downstream
    // in registry practice) — rule 2 checks the output site only.
    val s = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT k, CAST(s AS BIGINT) AS n FROM agg"
    assert(OracleLint.uncastFinalSelectSums(s).isEmpty)
    // HAVING is not in the projection either.
    val h = "SELECT l_orderkey FROM lineitem GROUP BY 1 " +
      "HAVING sum(l_quantity) > 250"
    assert(OracleLint.uncastFinalSelectSums(h).isEmpty)
  }

  test("an uncast-sum alias passed BARE through the final SELECT is caught (the passthrough hole)") {
    // Rule 2's sum scan can't see this shape — the final SELECT has no
    // sum( token, yet the output column is the CTE's HUGEINT.
    val bad = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT k, s FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(bad).nonEmpty)
    assert(OracleLint.violations(Map("q" -> bad))
      .exists(v => v.startsWith("q:") && v.contains("passed bare")))
    // Cast at the reference site is clean…
    val ok1 = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT k, CAST(s AS BIGINT) AS n FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(ok1).isEmpty)
    // …as is a postfix cast, or casting the SUM itself in the CTE…
    val ok2 = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT k, s::BIGINT AS n FROM agg"
    val ok3 = "WITH agg AS (SELECT k, CAST(sum(c) AS BIGINT) AS s " +
      "FROM t GROUP BY k) SELECT k, s FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(ok2).isEmpty)
    assert(OracleLint.uncastSumAliasPassthrough(ok3).isEmpty)
    // …and an alias used only OUTSIDE the final projection (join/where)
    // does not flag.
    val ok4 = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT CAST(count(*) AS BIGINT) AS n FROM agg WHERE s > 5"
    assert(OracleLint.uncastSumAliasPassthrough(ok4).isEmpty)
  }

  test("the house fix form CAST(s AS T) AS s is clean: a declaration alias is not a reference") {
    // Re-aliasing to the SAME name is the registry's dominant style; the
    // word after AS declares the output column, it does not read the
    // hazard value — flagging it would brick the gate on its own
    // documented fix form.
    val ok = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT k, CAST(s AS BIGINT) AS s FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(ok).isEmpty)
    // The declaration exemption must NOT excuse a bare reference that
    // merely FOLLOWS some other alias declaration.
    val bad = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT k AS kk, s FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(bad).nonEmpty)
  }

  test("a star projection over a CTE with an uncast sum is caught; stars are fine without hazards or inside calls") {
    // SELECT * passes every CTE column through untyped — no word token
    // ever matches the hazard alias, so the star itself must flag.
    val bad = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT * FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(bad).nonEmpty)
    val badDot = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT agg.* FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(badDot).nonEmpty)
    // No hazard aliases: a star projection is out of scope.
    val okNoHazard = "WITH agg AS (SELECT k, CAST(sum(c) AS BIGINT) AS s " +
      "FROM t GROUP BY k) SELECT * FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(okNoHazard).isEmpty)
    // count(*) and multiplication stars never flag.
    val okCall = "WITH agg AS (SELECT k, sum(c) AS s FROM t GROUP BY k) " +
      "SELECT CAST(count(*) AS BIGINT) AS n, CAST(s AS BIGINT) * 2 AS d " +
      "FROM agg"
    assert(OracleLint.uncastSumAliasPassthrough(okCall).isEmpty)
  }

  test("an injected round() over a division is caught; grid-legal rounds stay clean") {
    // The cross-engine .5-boundary hazard: round of a raw rational
    // (measured divergent: round(41/640., 6) DuckDB vs Spark).
    val bad = "SELECT round(a / b, 6) AS frac FROM t"
    assert(OracleLint.roundOnRational(bad).nonEmpty)
    assert(OracleLint.violations(Map("q" -> bad))
      .exists(v => v.startsWith("q:") && v.contains("Quant.q6")))
    val bad2 = "SELECT round(100 * hits // total) AS pct FROM t" // integer div too
    assert(OracleLint.roundOnRational(bad2).nonEmpty)
    // Decimal-grid money sums carry no division and stay legal…
    val ok1 = "SELECT round(sum(l_extendedprice), 2) AS total FROM t"
    assert(OracleLint.roundOnRational(ok1).isEmpty)
    // …a division in the SECOND argument (grid width) is not a rational…
    val ok2 = "SELECT round(x, 8 / 2) AS r FROM t"
    assert(OracleLint.roundOnRational(ok2).isEmpty)
    // …and a slash inside a string literal is opaque.
    val ok3 = "SELECT round(len('a/b'), 2) AS r FROM t"
    assert(OracleLint.roundOnRational(ok3).isEmpty)
  }

  test("an apostrophe in a -- comment cannot blind the scan (comments are masked like strings)") {
    // Live failure shape: a lone apostrophe in an English SQL comment
    // used to invert the string mask for the REST of the statement —
    // every rule after the comment went blind and the paren walks
    // desynced. The violation after the comment must still be caught.
    val bad = "SELECT v FROM (\n" +
      "  -- mirrors piiScrub's null handling.\n" +
      "  SELECT cnt * 100 // sum(cnt) OVER (PARTITION BY k) AS v FROM t)"
    assert(OracleLint.uncastWindowedSums(bad).nonEmpty)
    // And a '--' INSIDE a string literal is string content, not a
    // comment opener: the violation on the same line must still flag.
    val bad2 = "SELECT regexp_replace(x, '--', '') AS r, " +
      "sum(c) OVER (PARTITION BY k) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(bad2).nonEmpty)
    // A fully-commented-out violation is no violation.
    val ok = "SELECT CAST(sum(c) OVER () AS BIGINT) AS w\n" +
      "-- sum(c) OVER (PARTITION BY k)\n FROM t"
    assert(OracleLint.uncastWindowedSums(ok).isEmpty)
  }

  test("an apostrophe or -- inside a double-quoted identifier cannot blind the scan") {
    // Same failure class as the comment fix, quoted-identifier edition:
    // a "user's" or "a--b" identifier must not open a phantom string or
    // comment mask — the violation after it must still be caught.
    val bad = "SELECT \"user's\" AS u, " +
      "sum(c) OVER (PARTITION BY k) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(bad).nonEmpty)
    val bad2 = "SELECT \"a--b\" AS u, " +
      "sum(c) OVER (PARTITION BY k) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(bad2).nonEmpty)
    // A "" escape inside the identifier resumes the mask correctly.
    val bad3 = "SELECT \"we\"\"ird'\" AS u, " +
      "sum(c) OVER (PARTITION BY k) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(bad3).nonEmpty)
    // A sum spelled inside a quoted identifier is identifier text, not
    // a windowed sum.
    val ok = "SELECT \"sum(c) OVER (x\" AS u, " +
      "CAST(sum(c) OVER () AS BIGINT) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(ok).isEmpty)
  }

  test("a FILTER clause between the sum call and OVER is still a windowed sum") {
    val bad = "SELECT sum(v) FILTER (WHERE v > 0) OVER (PARTITION BY k) " +
      "AS w FROM t"
    assert(OracleLint.uncastWindowedSums(bad).nonEmpty)
    val ok = "SELECT CAST(sum(v) FILTER (WHERE v > 0) " +
      "OVER (PARTITION BY k) AS BIGINT) AS w FROM t"
    assert(OracleLint.uncastWindowedSums(ok).isEmpty)
  }

  test("whitespace before a postfix :: cast is accepted by BOTH the sum rule and the alias-passthrough rule") {
    val sql = "WITH a AS (SELECT sum(c) AS s FROM t) " +
      "SELECT s ::BIGINT AS total FROM a"
    // The sum rule already accepted `sum(c) ::BIGINT`-style whitespace;
    // the alias rule must accept the same form (they once diverged and
    // this shape false-positived).
    assert(OracleLint.uncastSumAliasPassthrough(sql).isEmpty)
  }

  test("IS [NOT] DISTINCT FROM does not terminate the final-select span (rules 2/2b keep scanning past it)") {
    // The FROM inside the comparison operator used to close the span —
    // an uncast sum sitting LATER in the projection got zero coverage
    // (empirically: the span ended inside the operator).
    val bad = "SELECT a IS DISTINCT FROM b AS flag, sum(x) AS s " +
      "FROM t GROUP BY 1"
    assert(OracleLint.uncastFinalSelectSums(bad).nonEmpty)
    val bad2 = "SELECT a IS NOT DISTINCT FROM b AS flag, sum(x) AS s " +
      "FROM t GROUP BY 1"
    assert(OracleLint.uncastFinalSelectSums(bad2).nonEmpty)
    val ok = "SELECT a IS DISTINCT FROM b AS flag, " +
      "CAST(sum(x) AS BIGINT) AS s FROM t GROUP BY 1"
    assert(OracleLint.uncastFinalSelectSums(ok).isEmpty)
  }

  test("SELECT DISTINCT * / SELECT ALL * are projection stars — the passthrough rule flags them with hazards live") {
    val bad = "WITH a AS (SELECT sum(x) AS s FROM t) SELECT DISTINCT * FROM a"
    assert(OracleLint.uncastSumAliasPassthrough(bad).nonEmpty)
    val bad2 = "WITH a AS (SELECT sum(x) AS s FROM t) SELECT ALL * FROM a"
    assert(OracleLint.uncastSumAliasPassthrough(bad2).nonEmpty)
    // Arithmetic stars after an operand stay out of scope.
    val ok = "WITH a AS (SELECT CAST(sum(x) AS BIGINT) AS s FROM t) " +
      "SELECT s, s * 2 AS dbl FROM a"
    assert(OracleLint.uncastSumAliasPassthrough(ok).isEmpty)
  }

  test("a fully parenthesized statement still gets final-select coverage (outer paren layers stripped)") {
    // `(SELECT ...)` has no depth-0 SELECT — the span used to be (0,0)
    // and rules 2/2b checked NOTHING.
    val bad = "(SELECT sum(x) AS s FROM t)"
    assert(OracleLint.uncastFinalSelectSums(bad).nonEmpty)
    val bad2 = "((SELECT sum(x) AS s FROM t))"
    assert(OracleLint.uncastFinalSelectSums(bad2).nonEmpty)
    val ok = "(SELECT CAST(sum(x) AS BIGINT) AS s FROM t)"
    assert(OracleLint.uncastFinalSelectSums(ok).isEmpty)
  }

  test("a postfix :: cast after the window spec is cast-at-site — rule 1 accepts it like rule 2's forms") {
    val ok = "SELECT sum(x) OVER (PARTITION BY y)::BIGINT AS s FROM t"
    assert(OracleLint.uncastWindowedSums(ok).isEmpty)
    // Named-window form too.
    val ok2 = "SELECT sum(x) OVER w ::BIGINT AS s FROM t WINDOW w AS " +
      "(PARTITION BY y)"
    assert(OracleLint.uncastWindowedSums(ok2).isEmpty)
    // Still uncast without it.
    val bad = "SELECT sum(x) OVER (PARTITION BY y) AS s FROM t"
    assert(OracleLint.uncastWindowedSums(bad).nonEmpty)
  }

  test("every index-backed query names a registered query") {
    // Bench's untimed prepare pass iterates this set; a renamed query
    // that silently fell out would put its index build back inside timed
    // pass 1 (the round-11 append-bench outlier mechanism).
    val unknown = SparkEntry.indexBacked -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"indexBacked entries not in the registry: ${unknown.toSeq.sorted}")
  }

  test("every builtIndexes guard site is covered by indexBacked (reverse direction)") {
    // The subset check above catches a RENAME; this catches an ADDED
    // builtIndexes-guarded query missing from the set — whose build
    // would land back inside timed pass 1 with no test failing. Every
    // `builtIndexes.add(` call site in the registry source belongs to
    // exactly one registered query, so site count == set size.
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))
    val sites = "builtIndexes\\.add\\(".r.findAllIn(src).length
    assert(sites == SparkEntry.indexBacked.size,
      s"$sites builtIndexes.add sites vs ${SparkEntry.indexBacked.size} " +
        "indexBacked entries — a new index-backed query must be added " +
        "to SparkEntry.indexBacked (Bench prepare pass)")
  }

  test("correctnessKeys extracts only depth-1 keys") {
    val json = """{"q1": {"rows_match": true, "err": null},
                   "q2_agg": {"hash_match": false}}"""
    assert(Verify.correctnessKeys(json) === Set("q1", "q2_agg"))
  }

  test("vanishedQueries reports prior-round queries missing now") {
    val prev = Set("a", "b", "c")
    assert(Verify.vanishedQueries(prev, Set("a", "c", "d")) === Set("b"))
    assert(Verify.vanishedQueries(prev, prev) === Set.empty[String])
  }

  test("latestCorrectnessFile picks the highest round number") {
    val dir = java.nio.file.Files.createTempDirectory("lintspec").toFile
    try {
      java.nio.file.Files.writeString(
        new java.io.File(dir, "CORRECTNESS_r09.json").toPath, "{}")
      java.nio.file.Files.writeString(
        new java.io.File(dir, "CORRECTNESS_r10.json").toPath, "{}")
      java.nio.file.Files.writeString(
        new java.io.File(dir, "BENCH_r11.json").toPath, "{}")
      assert(Verify.latestCorrectnessFile(dir).map(_.getName)
        === Some("CORRECTNESS_r10.json"))
    } finally {
      Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      dir.delete()
    }
  }

  test("the current registry loses nothing vs the last driver round") {
    // The automated round-7 check, asserted hard in CI: if a query from
    // the checked-in latest CORRECTNESS file is no longer registered,
    // this spec fails (rename it only with a deliberate edit here).
    Verify.latestCorrectnessFile(new java.io.File(".")).foreach { f =>
      val prev = Verify.correctnessKeys(
        java.nio.file.Files.readString(f.toPath))
      val gone = Verify.vanishedQueries(prev, SparkEntry.queries.keySet)
      assert(gone.isEmpty,
        s"queries in ${f.getName} no longer registered: " +
          gone.toSeq.sorted.mkString(", "))
    }
  }
}
