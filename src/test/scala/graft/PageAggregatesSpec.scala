package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.{LogParams, RecentChange}
import graft.operators.PageAggregates

/** Ports every behavioral fixture of the reference's mocha suite
  * (test/tests.js:38-134) onto the batch aggregation core — the same
  * events, the same asserted state.
  */
class PageAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  /** The `rawEdit` fixture (test/tests.js:4-12), parameterized. */
  private def ev(
      title: String = "Foo", comment: String = "yo", user: String = "Jon",
      bot: Boolean = false, rcType: String = "edit",
      lengthOld: Long = 1L, lengthNew: Long = 2L, wiki: String = "enwiki",
      ts: Timestamp = t0): RecentChange =
    RecentChange(title, comment, 0, user, bot, rcType, lengthOld, lengthNew,
      wiki, "en.wikipedia.org", null, null, null, null, ts)

  private def agg(events: RecentChange*): DataFrame =
    PageAggregates.pageAggregates(events.toDS().toDF())

  private def one(events: RecentChange*): Row = {
    val rows = agg(events: _*).collect()
    assert(rows.length == 1, s"expected 1 page, got ${rows.length}")
    rows(0)
  }

  /** Row array/map accessors return runtime collection types that don't cast
    * to immutable Seq/Map — normalize for comparison.
    */
  private def seqOf(r: Row, field: String): Seq[String] =
    r.getSeq[String](r.fieldIndex(field)).toList

  private def mapOf(r: Row, field: String): Map[String, Long] =
    r.getMap[String, Long](r.fieldIndex(field)).toMap

  test("edit accounting: 1 page, bytesChanged=1, contributors=[Jon] (tests.js:38-51)") {
    val p = one(ev())
    assert(p.getAs[String]("title") == "Foo")
    assert(p.getAs[String]("id") == "Foo")   // bare id for enwiki
    assert(p.getAs[Long]("bytesChanged") == 1L)
    assert(p.getAs[Long]("edits") == 1L)
    assert(seqOf(p, "contributors") == Seq("Jon"))
    assert(seqOf(p, "anons").isEmpty)
  }

  test("distribution map: Jon -> 1 (tests.js:50)") {
    val d = mapOf(PageAggregates.distribution(Seq(ev()).toDS().toDF()).collect()(0),
      "distribution")
    assert(d == Map("Jon" -> 1L))
  }

  test("bot edits count nowhere (tests.js:80-95)") {
    val p = one(ev(bot = true))
    assert(p.getAs[Long]("edits") == 0L)
    assert(p.getAs[Long]("bytesChanged") == 0L)
    assert(seqOf(p, "contributors").isEmpty)
  }

  test("revert: reverts=1, edits=0, reverter not a contributor (tests.js:97-109)") {
    val p = one(ev(comment = "reverted", user = "Reverter"))
    assert(p.getAs[Long]("reverts") == 1L)
    assert(p.getAs[Long]("edits") == 0L)
    assert(seqOf(p, "contributors").isEmpty)
  }

  test("bot revert: reverts=1 AND bytesChanged applies (tests.js:111-122)") {
    val p = one(ev(comment = "reverted", user = "Reverter", bot = true))
    assert(p.getAs[Long]("reverts") == 1L)
    assert(p.getAs[Long]("bytesChanged") == 1L)
    assert(p.getAs[Long]("edits") == 0L)
  }

  test("AfD comment sets volatileFlags=1 (tests.js:124-134)") {
    val p = one(ev(), ev(comment = "Nominated page for deletion", user = "Vandal"))
    assert(p.getAs[Long]("volatileFlags") == 1L)
    assert(p.getAs[Long]("edits") == 2L)
  }

  test("anon editor: anonEdits increments on top of edits; listed in anons") {
    val p = one(ev(user = "192.168.0.1"), ev(user = "Jon"))
    assert(p.getAs[Long]("edits") == 2L)          // anon edits ARE edits
    assert(p.getAs[Long]("anonEdits") == 1L)      // counted additionally
    assert(seqOf(p, "anons") == Seq("192.168.0.1"))
    assert(seqOf(p, "contributors") == Seq("Jon"))
  }

  test("anon + named distribution counts both editor kinds (index.js:192-213)") {
    val d = mapOf(PageAggregates.distribution(
        Seq(ev(user = "192.168.0.1"), ev(user = "192.168.0.1"), ev(user = "Jon"))
          .toDS().toDF())
      .collect()(0), "distribution")
    assert(d == Map("192.168.0.1" -> 2L, "Jon" -> 1L))
  }

  test("isNew set by type='new' (index.js:247-249)") {
    assert(one(ev(rcType = "new")).getAs[Boolean]("isNew"))
    assert(!one(ev()).getAs[Boolean]("isNew"))
  }

  test("fixup events are dropped before aggregation (index.js:318)") {
    val rows = agg(ev(comment = "Fixed error in template"))
    assert(rows.collect().isEmpty)
  }

  test("non-article namespace dropped (index.js:316)") {
    val e = ev().copy(namespace = 4)
    assert(agg(e).collect().isEmpty)
  }

  test("start/updated span the event timestamps") {
    val t1 = Timestamp.valueOf("2024-01-01 01:00:00")
    val p = one(ev(ts = t0), ev(ts = t1))
    assert(p.getAs[Timestamp]("start") == t0)
    assert(p.getAs[Timestamp]("updated") == t1)
  }

  test("non-enwiki pages get wiki/title ids and keep wiki column") {
    val p = one(ev(wiki = "dewiki"))
    assert(p.getAs[String]("id") == "dewiki/Foo")
    assert(p.getAs[String]("wiki") == "dewiki")
  }

  test("metrics: editsPerMinute raw-count under 1 minute, rate after (index.js:80-88)") {
    val t1 = Timestamp.valueOf("2024-01-01 00:10:00")
    val pages = agg(ev(ts = t0), ev(ts = t1), ev(user = "Ann", ts = t1))
    val m = PageAggregates.withMetrics(pages, lit(t1)).collect()(0)
    assert(m.getAs[Double]("age") == 10.0)
    assert(m.getAs[Double]("editsPerMinute") == 0.3)
  }

  test("eviction policy: slow old page dropped, fresh page kept (index.js:362-392)") {
    val asOf = Timestamp.valueOf("2024-01-01 02:00:00")
    // Page A: started 2h ago, 1 edit → speed ~0.008 < 3, idle 2h > 60 → drop.
    // Page B: started 2 min ago → within minPurgeTime grace → keep.
    val pages = agg(
      ev(title = "Old", ts = t0),
      ev(title = "Fresh", ts = Timestamp.valueOf("2024-01-01 01:58:00")))
    val kept = PageAggregates.survivors(pages, lit(asOf)).select("id").as[String].collect()
    assert(kept.toSeq == Seq("Fresh"))
  }

  test("rename canonicalization migrates events to the new id (A4, index.js:154-167)") {
    val move = ev(title = "Foo").copy(
      logType = "log", logAction = "move",
      logParams = LogParams.ofMap(Map("target" -> "Bar")), ts = Timestamp.valueOf("2024-01-01 00:30:00"))
    val events = Seq(ev(ts = t0), move,
      ev(title = "Bar", ts = Timestamp.valueOf("2024-01-01 01:00:00"))).toDS().toDF()
    val agged = PageAggregates.trendAggregates(events)
    val ids = agged.select("id").as[String].collect().sorted
    assert(ids.toSeq == Seq("Bar"))
    val p = agged.collect()(0)
    assert(p.getAs[Long]("edits") == 2L) // both Foo-era and Bar-era edits
  }

  test("contributorCardinalities: HLL approximation tracks exact set sizes") {
    val events = (0 until 50).map(i =>
      ev(user = s"user$i", ts = new Timestamp(t0.getTime + i * 1000L))) ++
      (0 until 10).map(i =>
        ev(user = s"$i.0.0.1", ts = new Timestamp(t0.getTime + (100 + i) * 1000L)))
    val r = PageAggregates.contributorCardinalities(events.toDS().toDF()).collect()(0)
    // approx_count_distinct default rsd 5% — exact at these cardinalities.
    assert(math.abs(r.getAs[Long]("approxContributors") - 50L) <= 3)
    assert(math.abs(r.getAs[Long]("approxAnons") - 10L) <= 1)
  }

  test("vacated-title reuse: later move onto a vacated title maps directly (A4)") {
    def move(from: String, to: String, ts: String) =
      ev(title = from).copy(logType = "log", logAction = "move",
        logParams = LogParams.ofMap(Map("target" -> to)), ts = Timestamp.valueOf(ts))
    // A→B, then C→A: C's events must aggregate under A, not follow A→B.
    val events = Seq(
      ev(title = "A", user = "ua", ts = t0),
      ev(title = "C", user = "uc", ts = Timestamp.valueOf("2024-01-01 00:05:00")),
      move("A", "B", "2024-01-01 00:10:00"),
      move("C", "A", "2024-01-01 00:20:00")).toDS().toDF()
    val agged = PageAggregates.trendAggregates(events)
    val byId = agged.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId.keySet == Set("A", "B"))
    assert(seqOf(byId("A"), "contributors") == Seq("uc"))
    assert(seqOf(byId("B"), "contributors") == Seq("ua"))
  }

  test("rename chain a→b→c collapses to final title (A4)") {
    def move(from: String, to: String, ts: String) =
      ev(title = from).copy(logType = "log", logAction = "move",
        logParams = LogParams.ofMap(Map("target" -> to)), ts = Timestamp.valueOf(ts))
    val events = Seq(
      ev(title = "A", ts = t0),
      move("A", "B", "2024-01-01 00:10:00"),
      ev(title = "B", ts = Timestamp.valueOf("2024-01-01 00:20:00")),
      move("B", "C", "2024-01-01 00:30:00")).toDS().toDF()
    val agged = PageAggregates.trendAggregates(events)
    assert(agged.select("id").as[String].collect().toSeq == Seq("C"))
    assert(agged.collect()(0).getAs[Long]("edits") == 2L)
  }

  test("gated move: a fixup-comment or non-main-namespace move never rewrites history (index.js:316-318)") {
    // The reference's onmessage returns BEFORE the move dispatch when the
    // ns/project/fixup gate fires — the page keeps its old id.
    def gatedMove(comment: String, ns: Int) =
      ev(title = "Foo", comment = comment).copy(namespace = ns,
        logType = "log", logAction = "move",
        logParams = LogParams.ofMap(Map("target" -> "Bar")),
        ts = Timestamp.valueOf("2024-01-01 00:30:00"))
    for (m <- Seq(gatedMove("Fixed error in move", 0), gatedMove("moved", 118))) {
      val agged = PageAggregates.trendAggregates(
        Seq(ev(ts = t0), m).toDS().toDF())
      assert(agged.select("id").as[String].collect().toSeq == Seq("Foo"),
        s"move $m must be gated out")
    }
    // Control: the same move with a clean main-namespace gate rewrites.
    val clean = ev(title = "Foo", comment = "moved").copy(
      logType = "log", logAction = "move", logParams = LogParams.ofMap(Map("target" -> "Bar")),
      ts = Timestamp.valueOf("2024-01-01 00:30:00"))
    val agged = PageAggregates.trendAggregates(Seq(ev(ts = t0), clean).toDS().toDF())
    assert(agged.select("id").as[String].collect().toSeq == Seq("Bar"))
  }

  test("eviction speed is no-arg editsPerMinute: reverts do not keep a page alive (index.js:374)") {
    val asOf = Timestamp.valueOf("2024-01-01 02:00:00")
    // Page Rev: 1 edit + 200 reverts over 2h — flags-on speed would be
    // ~1.7 epm, but the cleaner's no-arg call sees 1/120 ≈ 0.008 < 3 and
    // idle 2h > 60 → drop (the reference purges it; so must we).
    val events = ev(title = "Rev", ts = t0) +:
      (0 until 200).map(i => ev(title = "Rev", comment = "reverted",
        user = s"r$i", ts = new Timestamp(t0.getTime + i * 1000L)))
    val pages = agg(events: _*)
    val kept = PageAggregates.survivors(pages, lit(asOf))
      .select("id").as[String].collect()
    assert(kept.isEmpty)
  }
}
