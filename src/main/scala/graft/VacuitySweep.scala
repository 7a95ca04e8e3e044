package graft
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Oracle-discrimination audit over a [[Verify]] dump: flags every result
  * column whose value never varies at the verification scale.
  *
  * Why this exists: a green hash proves nothing when the synthetic mapping
  * makes the metric constant — `trend_bias` verified the literal 1.0 for
  * five rounds because every page had one editor, and `doc_exact_dedup`
  * verified `dup_count = 1` because sf0.01 has no duplicate texts. This
  * sweep turns the manual column-cardinality audit that caught those into
  * a repeatable gate: run `graft.Verify <sf> <dump>` then
  * `runMain graft.VacuitySweep <dump>`; it fails loudly on any
  * single-valued column not on the checked-in allowlist
  * (`src/main/resources/vacuity-allowlist.txt`, one `query.column: reason`
  * per line — every entry is a reviewed by-construction constant).
  *
  * Scope rules:
  *   - rows == 0 → violation (an empty result verifies nothing) unless
  *     `query.*` is allowlisted.
  *   - rows == 1 → reported as info only: a single-row aggregate report is
  *     not vacuous — its one value is still exact-compared; vacuity is a
  *     COLUMN that cannot vary across a population.
  *   - rows >= 2 with a column at <= 1 distinct non-null value → violation
  *     unless `query.column` (or `query.*`) is allowlisted.
  *
  * Cardinality counts DISTINCT NON-NULL values, as
  * `count_distinct(when(isNotNull, to_json(struct(col))))` — to_json
  * makes arrays/maps/structs comparable, and the isNotNull guard keeps a
  * NULL from minting its own `{}` token: a column that degrades to NULL
  * on most rows with one constant elsewhere has exactly 1 distinct
  * non-null value and MUST flag (to_json alone counted 2 and passed it).
  * An all-NULL column counts 0 and is flagged.
  */
object VacuitySweep {
  final case class ColCard(query: String, column: String, rows: Long,
                           distinct: Long)

  /** Parse allowlist lines of the form `query.column: reason` (the column
    * part may be `*`); `#` starts a comment. The reason is mandatory —
    * an allowlist entry without a written justification is how vacuous
    * checks survive review.
    */
  private[graft] def parseAllowlist(lines: Seq[String]): Map[String, String] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(':')
        require(i > 0, s"allowlist line missing ': reason' — $l")
        val key = l.substring(0, i).trim
        val reason = l.substring(i + 1).trim
        require(key.contains('.'), s"allowlist key must be query.column — $l")
        require(reason.nonEmpty, s"allowlist reason is empty — $l")
        key -> reason
      } match { case pairs =>
        val dups = pairs.groupBy(_._1).collect {
          case (k, vs) if vs.size > 1 => k }
        require(dups.isEmpty,
          s"duplicate allowlist keys (last-one-wins would silently pick " +
            s"a justification): ${dups.mkString(", ")}")
        pairs.toMap
      }

  private[graft] def loadAllowlist(): Map[String, String] = {
    val in = getClass.getResourceAsStream("/vacuity-allowlist.txt")
    require(in != null, "vacuity-allowlist.txt missing from resources")
    try parseAllowlist(
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq)
    finally in.close()
  }

  /** One pass per query: rows + per-column distinct counts in a single
    * aggregation (no per-column jobs). */
  private[graft] def sweepQuery(spark: SparkSession, dir: java.io.File)
      : Seq[ColCard] = {
    val df = spark.read.parquet(dir.getAbsolutePath)
    val cols = df.columns.toSeq
    // MapType canonicalization: to_json serializes map entries in their
    // PHYSICAL order, so two equal maps with different entry order count
    // as distinct — a semantically constant map column would then pass
    // the gate (a false negative in the exact audit this tool performs).
    // Sort the entries first; non-map types (and maps nested deeper than
    // the top level, which no dump emits) pass through unchanged.
    def canon(c: String): Column = df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.MapType =>
        map_from_entries(array_sort(map_entries(col(c))))
      case _ => col(c)
    }
    val aggs = count(lit(1)).as("__rows") +:
      cols.map(c => count_distinct(
        when(col(c).isNotNull, to_json(struct(canon(c))))).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getLong(0)
    cols.zipWithIndex.map { case (c, i) =>
      ColCard(dir.getName, c, rows, row.getLong(i + 1))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VacuitySweep <verifyDumpDir> [query...]")
    val dumpDir = new java.io.File(args(0))
    // Optional query-name filters mirror Verify's: a partial sweep over a
    // partial dump. With NO filter the sweep expects EVERY registered
    // query to be present — a query whose dump directory is wholly absent
    // is a violation, not a skip: Verify catches per-query failures,
    // deletes the failed dump, and exits 0, so "absent" is exactly how 18
    // queries silently vanished from round 7's gate.
    val expected: Set[String] =
      if (args.length > 1) {
        val filters = args.drop(1).toSet
        val unknown = filters -- SparkEntry.queries.keySet
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
        filters
      } else SparkEntry.queries.keySet
    val allDirs = Option(dumpDir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).sortBy(_.getName).toSeq
    val queryDirs = allDirs.filter(d => expected.contains(d.getName))
    // A dump dir matching NO registered query is a stale artifact of a
    // renamed/removed query — the sweep must not silently audit around
    // it. (Nothing deletes these automatically: Verify only removes a
    // FAILED query's own dump; the operator deletes stale dirs by hand
    // after checking the rename was intentional.)
    val staleDirs = allDirs.map(_.getName)
      .filterNot(n => SparkEntry.queries.contains(n))
    val missing = (expected -- queryDirs.map(_.getName).toSet).toSeq.sorted
    // An all-absent/all-stale dump must fail with the ACCURATE
    // diagnosis — naming the missing queries and stale dirs — not a
    // blanket "no query dumps" that points the operator away from the
    // real cause (a filtered query whose failed dump Verify deleted,
    // or a dump full of renamed-query leftovers).
    require(queryDirs.nonEmpty,
      s"no expected query dumps under $dumpDir" +
        (if (missing.nonEmpty)
          s" — ABSENT: ${missing.take(8).mkString(", ")}" +
            (if (missing.size > 8) s" (+${missing.size - 8} more)" else "")
        else "") +
        (if (staleDirs.nonEmpty)
          s"; stale (unregistered) dirs present: " +
            staleDirs.take(5).mkString(", ")
        else ""))
    val allow = loadAllowlist()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Unreadable dumps are tracked SEPARATELY from legitimately-empty
    // results: folding them into the zero-row card would let a
    // `query.*: empty by construction` allowlist waiver also silently
    // waive a corrupt/partial dump — exactly the silent-vanish failure
    // mode (round 7's 18 disappearing queries) this gate exists to catch.
    // An unreadable dump is ALWAYS a violation, never allowlistable.
    val unreadable = Seq.newBuilder[String]
    val unreadableQueries = Set.newBuilder[String]
    val cards = queryDirs.flatMap { d =>
      try sweepQuery(spark, d)
      catch { case NonFatal(e) =>
        System.err.println(s"[vacuity] ${d.getName} unreadable: ${e.getMessage}")
        unreadable += s"${d.getName}: UNREADABLE dump (${e.getClass.getSimpleName})"
        unreadableQueries += d.getName
        Seq.empty
      }
    }
    spark.stop()

    def allowed(q: String, c: String): Option[String] =
      allow.get(s"$q.$c").orElse(allow.get(s"$q.*"))

    val byQuery = cards.groupBy(_.query)
    val empty = byQuery.filter(_._2.head.rows == 0).keys.toSeq.sorted
    val single = byQuery.filter(_._2.head.rows == 1).keys.toSeq.sorted
    val constant = cards.filter(c => c.rows >= 2 && c.distinct <= 1)

    single.foreach(q => println(s"[vacuity] info: $q is a 1-row report " +
      "(values exact-compared; column variance not applicable)"))
    val waived = (constant.map(c => (s"${c.query}.${c.column}",
        allowed(c.query, c.column))) ++
      empty.map(q => (s"$q (empty result)", allowed(q, "*"))))
      .collect { case (k, Some(reason)) => s"$k — $reason" }
    waived.sorted.foreach(w => println(s"[vacuity] allowlisted: $w"))

    val violations =
      // Missing and stale dumps are never allowlistable (same rationale
      // as unreadable ones: a waiver for "legitimately empty" must not
      // double as a waiver for "never ran").
      missing.map(q => s"$q: dump directory ABSENT — query never dumped " +
        "(failed or skipped in Verify)") ++
      staleDirs.map(n => s"$n: stale dump dir matches no registered query") ++
      unreadable.result() ++
      empty.filter(q => allowed(q, "*").isEmpty)
        .map(q => s"$q: EMPTY result — verifies nothing") ++
      constant.filter(c => allowed(c.query, c.column).isEmpty)
        .map(c => s"${c.query}.${c.column}: constant over ${c.rows} rows")
    // Stale allowlist entries are violations too: an entry whose column now
    // varies (or whose query vanished) hides future regressions behind a
    // stale waiver.
    val live = cards.map(c => s"${c.query}.${c.column}").toSet ++
      byQuery.keys.flatMap(q => Seq(s"$q.*"))
    val activeKeys =
      constant.map(c => s"${c.query}.${c.column}").toSet ++
      constant.map(c => s"${c.query}.*").toSet ++
      empty.flatMap(q => Seq(s"$q.*")).toSet
    // (live already holds `q.*` for every swept query, so no extra
    // wildcard clause is needed here.) Under a partial sweep an entry for
    // a REGISTERED-but-unswept query is NOT stale — it was simply out of
    // scope. An entry whose query is not registered at all (renamed or
    // removed) is stale on EVERY sweep: exempting it too would let a
    // dead waiver linger and silently suppress a real violation if the
    // name is ever re-added.
    // A query whose dump is ABSENT or UNREADABLE already fails the sweep
    // with its own violation — its allowlist keys produce no cards this
    // run, but flagging them "matches no dumped column" would instruct
    // the operator to delete a valid, reviewed entry (and a later
    // healthy sweep would then fail on the legitimate constant).
    val unauditable = missing.toSet ++ unreadableQueries.result()
    val outOfScope = (k: String) => {
      val q = k.substring(0, k.lastIndexOf('.'))
      (SparkEntry.queries.contains(q) && !expected.contains(q)) ||
        unauditable.contains(q)
    }
    // A query whose dump is EMPTY this run makes its columns'
    // constancy UNASSESSABLE, not disproven: the empty dump already
    // fails the sweep with its own violation (unless `q.*`-waived), and
    // telling the operator to ALSO delete a reviewed column entry would
    // make the next healthy sweep fail on the legitimate constant — the
    // same churn the ABSENT/UNREADABLE exemption prevents. A 1-ROW
    // dump's entry IS flagged, but with the honest reason (variance is
    // not applicable to the report's shape), not "no longer constant".
    val emptySet = empty.toSet
    val singleSet = single.toSet
    def queryOf(k: String) = k.substring(0, k.lastIndexOf('.'))
    val stale = allow.keys.filterNot(k => live.contains(k) || outOfScope(k))
      .toSeq.sorted.map(k => s"$k: allowlist entry matches no dumped column") ++
      allow.keys.filter(k => live.contains(k) && !activeKeys.contains(k) &&
          !emptySet.contains(queryOf(k)))
        .toSeq.sorted.map(k =>
          if (singleSet.contains(queryOf(k)))
            s"$k: allowlist entry covers a 1-row report (column variance " +
              "not applicable — values are exact-compared) — remove it"
          else s"$k: allowlist entry no longer constant — remove it")

    val all = violations ++ stale
    all.foreach(v => println(s"[vacuity] VIOLATION: $v"))
    println(s"[vacuity] swept ${byQuery.size} queries / ${cards.size} columns; " +
      s"${waived.size} allowlisted, ${all.size} violations")
    require(all.isEmpty, s"${all.size} vacuity violation(s) — see above")
  }
}
