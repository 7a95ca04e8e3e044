package graft

import java.sql.Timestamp

import graft.model.{LogParams, RecentChange, TrendConfig}
import graft.streaming.IncrementalTrend

/** Incremental state-table spec: cross-key rename carried ACROSS
  * micro-batches (the semantics flatMapGroupsWithState can't express),
  * overwrite-not-merge at the rename target, log-comment deletes, protect,
  * eviction — the reference behaviors at index.js:154-167, 324-337.
  */
class IncrementalTrendSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
  private val asOf = at(10).getTime

  // Relaxed eviction so fixtures survive.
  private val cfg = TrendConfig(minSpeed = 0.0, maxInactivityMins = 1000000,
    maxLifespanMins = 1000000)

  private def edit(title: String, user: String = "Jon", min: Int = 0,
      comment: String = "yo", wiki: String = "enwiki"): RecentChange =
    RecentChange(title, comment, 0, user, bot = false, "edit", 1L, 2L, wiki,
      "en.wikipedia.org", null, null, null, null, at(min))

  private def move(from: String, to: String, min: Int,
      wiki: String = "enwiki"): RecentChange =
    RecentChange(from, "moved", 0, "Admin", bot = false, "log", 0L, 0L, wiki,
      "en.wikipedia.org", "log", "move", LogParams.ofMap(Map("target" -> to)), null, at(min))

  private def del(comment: String, min: Int): RecentChange =
    RecentChange("x", "deleted", 0, "Admin", bot = false, "log", 0L, 0L,
      "enwiki", "en.wikipedia.org", "log", "delete", null, comment, at(min))

  private def protect(title: String, min: Int): RecentChange =
    RecentChange(title, "protected", 0, "Admin", bot = false, "log", 0L, 0L,
      "enwiki", "en.wikipedia.org", "log", "protect", null, null, at(min))

  private def replay(batches: Seq[RecentChange]*) =
    IncrementalTrend.replay(spark, batches, asOf, cfg)
      .collect().map(r => r.getAs[String]("id") -> r).toMap

  test("log_params wire variants gate the fold's deletes like the reference's !params.length (index.js:329)") {
    def delP(lp: LogParams, min: Int) =
      del("deleted &quot;[[Doomed]]&quot;", min).copy(logParams = lp)
    // Non-empty legacy ARRAY, non-empty STRING, and a map whose literal
    // "length" ENTRY duck-types truthy ({length:"2"}.length is "2" in
    // JS): gated OUT (the MapType-decode model read the first two as
    // null = empty and dropped state the reference keeps).
    for (lp <- Seq(LogParams.ofArr(Seq("0", "1")), LogParams.ofStr("legacy"),
        LogParams.ofMap(Map("length" -> "2")))) {
      val st = replay(Seq(edit("Doomed", min = 0), delP(lp, 1)))
      assert(st.keySet == Set("Doomed"), s"$lp gates the delete out")
    }
    // Empty array, empty string, and any map WITHOUT a truthy "length"
    // entry (a JS object has no intrinsic .length, so `!params.length`
    // is true even for a populated one): gate OPEN.
    for (lp <- Seq(LogParams.ofArr(Nil), LogParams.ofStr(""),
        LogParams.ofMap(Map.empty), LogParams.ofMap(Map("suppress" -> "x")),
        LogParams.ofMap(Map("length" -> "")))) {
      val st = replay(Seq(edit("Doomed", min = 0), delP(lp, 1)))
      assert(st.keySet.isEmpty, s"$lp leaves the gate open: page dropped")
    }
  }

  test("array/string-form MOVE is a tested no-op — the reference's junk 'undefined' page is a deliberate divergence (index.js:156,440)") {
    // The reference calls renamePage(title, wiki, params.target) with
    // whatever log_params carried; on the array/string wire forms the
    // property access is JS `undefined`, so it accidentally MOVES the
    // page onto a junk title keyed "undefined" (and kills the source).
    // Graft nulls the target instead (Classifiers.logParamsTarget is
    // map-form-only) and every consumer drops null-target moves — the
    // sane choice, PINNED here as a divergence: the source page
    // survives untouched (no edits change, no `updated` re-stamp — a
    // real move stamps it, index.js:164) and no junk page exists.
    def moveNonMap(lp: LogParams, min: Int): RecentChange =
      RecentChange("Foo", "moved", 0, "Admin", bot = false, "log", 0L, 0L,
        "enwiki", "en.wikipedia.org", "log", "move", lp, null, at(min))
    for (lp <- Seq(LogParams.ofArr(Seq("Bar")), LogParams.ofStr("Bar"),
        LogParams.ofArr(Nil), null)) {
      val st = replay(Seq(edit("Foo", min = 0), moveNonMap(lp, 1)))
      assert(st.keySet == Set("Foo"),
        s"$lp: non-map move must be a no-op — got ${st.keySet}")
      assert(st("Foo").getAs[Long]("edits") == 1L)
      assert(st("Foo").getAs[Timestamp]("updated") == at(0),
        s"$lp: a dropped move must not re-stamp `updated`")
    }
    // The classify path agrees end to end: the same wire forms decode
    // to a null target (TrendStreamSpec pins the decode), and a
    // MAP-form move still works in this exact fixture shape.
    val moved = replay(Seq(edit("Foo", min = 0), move("Foo", "Bar", 1)))
    assert(moved.keySet == Set("Bar"))
  }

  test("null-id page: the state merge is null-safe — fold-invariance holds across batches (round-9 rule)") {
    // A null-title edit with a non-falsy wiki yields pageId = NULL; the
    // round-9 decision PRESERVES it as one group (the fgws groupByKey
    // groups null keys; TrendCollection's ops were made null-safe for
    // it). The state merge's `===` join never matched NULL to NULL, so
    // every batch carrying such edits duplicated the null-id state row.
    def nullEdit(min: Int, user: String): RecentChange =
      RecentChange(null, "yo", 0, user, bot = false, "edit", 1L, 2L,
        "dewiki", "en.wikipedia.org", null, null, null, null, at(min))
    val twoBatches = replay(
      Seq(edit("Foo", min = 0), nullEdit(0, "A")),
      Seq(nullEdit(1, "B")))
    val oneBatch = replay(
      Seq(edit("Foo", min = 0), nullEdit(0, "A"), nullEdit(1, "B")))
    assert(twoBatches.keySet == Set("Foo", null), twoBatches.keySet.toString)
    assert(twoBatches.keySet == oneBatch.keySet)
    assert(twoBatches(null).getAs[Long]("edits") == 2L,
      "both null-id edits fold into ONE row")
    assert(twoBatches(null).getAs[Long]("edits") ==
      oneBatch(null).getAs[Long]("edits"))
  }

  test("run()'s eviction clock clamps to the newest event ts (the updateFn backlog rule)") {
    // Pure-function check of the clamp run() feeds foldBatch: replaying
    // a backlog must not read wall clock ahead of the data; an empty
    // batch (no event clock) keeps wall time for the live sweep.
    import graft.streaming.IncrementalTrend.dataAsOfMs
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    assert(dataAsOfMs(t.getTime + 86400000L, t) == t.getTime,
      "backlog replay: the data clock wins")
    assert(dataAsOfMs(t.getTime - 5000L, t) == t.getTime - 5000L,
      "live stream: wall clock wins")
    assert(dataAsOfMs(12345L, null) == 12345L, "empty batch: wall time")
  }

  test("timeline routing rewrites BOTH halves of the final key — a falsy-wiki edit colliding with a moved key rides the object") {
    // pageId is ambiguous across wikis: an edit with a FALSY wiki whose
    // title spells "dewiki/T" lands on the same key as dewiki's "T".
    // When that key's object moves, the routed edit must adopt the
    // object's final (wiki, title) — a title-only rewrite used to
    // recompute id = "T2" (bare) instead of "dewiki/T2", splitting the
    // edit off the moved page (and the reference, sharing one titles
    // map, applies it to the moved page).
    def wikiEdit(wiki: String, title: String, min: Int,
        user: String): RecentChange =
      RecentChange(title, "yo", 0, user, bot = false, "edit", 1L, 2L,
        wiki, "en.wikipedia.org", null, null, null, null, at(min))
    def wikiMove(wiki: String, from: String, to: String,
        min: Int): RecentChange =
      RecentChange(from, "moved", 0, "Admin", bot = false, "log", 0L, 0L,
        wiki, "en.wikipedia.org", "log", "move",
        LogParams.ofMap(Map("target" -> to)), null, at(min))
    val st = replay(Seq(
      wikiEdit("dewiki", "T", 0, "A"),
      wikiMove("dewiki", "T", "T2", 1),
      // Falsy-wiki edit at the VACATED-then-owned key's history: ts=0.5
      // min → rides the pre-move segment of the dewiki object.
      wikiEdit(null, "dewiki/T", 0, "B")))
    assert(st.keySet == Set("dewiki/T2"), st.keySet.toString)
    assert(st("dewiki/T2").getAs[Long]("edits") == 2L,
      "the colliding falsy-wiki edit merges into the moved page")
  }

  test("reference move fixture: rename leaves exactly one page (tests.js:63-78)") {
    val st = replay(Seq(edit("Foo", min = 0), move("Foo", "FoO", 1)))
    assert(st.keySet == Set("FoO"))
    assert(st("FoO").getAs[Long]("edits") == 1L)
    assert(st("FoO").getAs[String]("title") == "FoO")
    // renamePage stamps `updated` at the move (index.js:164) — the rename
    // RESETS the idle clock, so the migrated row carries the move's ts,
    // not the last pre-move edit's.
    assert(st("FoO").getAs[Timestamp]("updated") == at(1))
  }

  test("cross-batch rename migrates accumulated state to the new key") {
    val st = replay(
      Seq(edit("Foo", min = 0), edit("Foo", user = "Ann", min = 1)),
      Seq(move("Foo", "Bar", 2)),
      Seq(edit("Bar", user = "Eve", min = 3)))
    assert(st.keySet == Set("Bar"))
    val p = st("Bar")
    assert(p.getAs[Long]("edits") == 3L) // 2 carried + 1 post-rename
    assert(p.getSeq[String](p.fieldIndex("contributors")).toSet ==
      Set("Jon", "Ann", "Eve"))
  }

  test("rename overwrites existing state at the target (index.js:162-166)") {
    val st = replay(
      Seq(edit("Old", min = 0), edit("Old", min = 1),
        edit("Target", user = "T", min = 0)),
      Seq(move("Old", "Target", 2)))
    assert(st.keySet == Set("Target"))
    // Old's 2 edits replace Target's 1 (overwrite, not merge).
    assert(st("Target").getAs[Long]("edits") == 2L)
  }

  test("delete via log_action_comment drops state across batches (A6)") {
    val st = replay(
      Seq(edit("Doomed", min = 0), edit("Kept", min = 0)),
      Seq(del("deleted &quot;[[Doomed]]&quot; for reasons", 1)))
    assert(st.keySet == Set("Kept"))
  }

  test("protect sets the flag on existing state (A5)") {
    val st = replay(
      Seq(edit("Page", min = 0)),
      Seq(protect("Page", 1)))
    assert(st("Page").getAs[Boolean]("isProtected"))
  }

  test("eviction applies per batch at processing time (A7)") {
    val strict = TrendConfig(minSpeed = 1000.0, minPurgeTimeMins = 1)
    val st = IncrementalTrend.replay(spark,
      Seq(Seq(edit("Slow", min = 0))), asOf, strict).collect()
    assert(st.isEmpty) // too slow, past grace period
  }

  test("vacated-title reuse: C moved onto A's old title stays at A, not A's destination") {
    // A→B at t2, then C→A at t4: C's history must land on A (the vacated
    // title), NOT follow A's earlier mapping to B.
    val st = replay(Seq(
      edit("A", user = "ua", min = 0),
      edit("C", user = "uc", min = 1),
      move("A", "B", 2),
      edit("B", user = "ub", min = 3),
      move("C", "A", 4)))
    assert(st.keySet == Set("A", "B"))
    assert(st("A").getAs[Long]("edits") == 1L)  // C's history now at A
    val a = st("A")
    assert(a.getSeq[String](a.fieldIndex("contributors")) == Seq("uc"))
    assert(st("B").getAs[Long]("edits") == 2L)  // A's + post-move edits
  }

  test("delete then same-batch recreate keeps only post-delete edits (A6)") {
    val st = replay(Seq(
      edit("Phoenix", user = "Old", min = 0),
      del("deleted &quot;[[Phoenix]]&quot; spam", 1),
      edit("Phoenix", user = "New", min = 2)))
    val p = st("Phoenix")
    assert(p.getAs[Long]("edits") == 1L)
    assert(p.getSeq[String](p.fieldIndex("contributors")) == Seq("New"))
  }

  test("two same-batch moves onto one target: the later move wins deterministically") {
    val st = replay(
      Seq(edit("A", user = "ua", min = 0), edit("A", user = "ua2", min = 1),
        edit("B", user = "ub", min = 0)),
      Seq(move("A", "C", 2), move("B", "C", 3)))
    assert(st.keySet == Set("C"))
    // B's move is later; B's state overwrites A's at C.
    val c = st("C")
    assert(c.getAs[Long]("edits") == 1L)
    assert(c.getSeq[String](c.fieldIndex("contributors")) == Seq("ub"))
  }

  // --- sequential log-op replay (event-time ordering, getPage-creates) ----

  test("delete-then-move in one batch: the move plants a FRESH page at the target (getPage creates)") {
    // Reference sequential replay: delete P kills its state; the move's
    // getPage(P) then REGISTERS a fresh page and renames it onto Q —
    // P's pre-delete history must NOT survive under Q (the pre-round-10
    // phase-ordered fold applied renames before deletes and leaked it).
    val st = replay(
      Seq(edit("P", user = "Old", min = 0), edit("Q", user = "QOld", min = 0)),
      Seq(del("deleted &quot;[[P]]&quot; spam", 1), move("P", "Q", 2)))
    assert(st.keySet == Set("Q"))
    assert(st("Q").getAs[Long]("edits") == 0L) // fresh page, Q's state overwritten
    assert(st("Q").getAs[Timestamp]("updated") == at(2))
  }

  test("delete of the TARGET before a move: the moved state survives (delete preceded)") {
    val st = replay(
      Seq(edit("P", user = "up", min = 0), edit("Q", user = "uq", min = 0)),
      Seq(del("deleted &quot;[[Q]]&quot; gone", 1), move("P", "Q", 2)))
    assert(st.keySet == Set("Q"))
    val q = st("Q")
    assert(q.getAs[Long]("edits") == 1L)
    assert(q.getSeq[String](q.fieldIndex("contributors")) == Seq("up"))
  }

  test("protect-then-move: the flag rides the moved page to its new key") {
    val st = replay(
      Seq(edit("P", min = 0)),
      Seq(protect("P", 1), move("P", "Q", 2)))
    assert(st.keySet == Set("Q"))
    assert(st("Q").getAs[Boolean]("isProtected"))
  }

  test("move-then-protect of the vacated source: no flag anywhere (page absent at protect time)") {
    val st = replay(
      Seq(edit("P", min = 0)),
      Seq(move("P", "Q", 1), protect("P", 2)))
    assert(st.keySet == Set("Q"))
    assert(!st("Q").getAs[Boolean]("isProtected"))
  }

  test("edit to a vacated title AFTER its move recreates a fresh page at the old key") {
    // index.js: updateFromRCStream's getPage(P) creates a new page once
    // P's object moved to Q — the edit must not follow the rename map.
    val st = replay(Seq(
      edit("P", user = "before", min = 0),
      move("P", "Q", 1),
      edit("P", user = "after", min = 2)))
    assert(st.keySet == Set("P", "Q"))
    val p = st("P"); val q = st("Q")
    assert(q.getSeq[String](q.fieldIndex("contributors")) == Seq("before"))
    assert(p.getSeq[String](p.fieldIndex("contributors")) == Seq("after"))
  }

  test("move of an ABSENT source registers an empty page over the target's state") {
    val st = replay(
      Seq(edit("Q", user = "uq", min = 0)),
      Seq(move("Ghost", "Q", 1)))
    assert(st.keySet == Set("Q"))
    assert(st("Q").getAs[Long]("edits") == 0L)
    assert(st("Q").getAs[String]("title") == "Q")
  }

  test("protect applies only to a page existing at the protect's event time") {
    // Same-batch: edits strictly after the protect must not inherit the
    // flag (the page did not exist when protectPage ran); edits at or
    // before it must.
    val flagged = replay(Seq(edit("A", min = 0), protect("A", 1)))
    assert(flagged("A").getAs[Boolean]("isProtected"))
    val unflagged = replay(Seq(protect("B", 1), edit("B", min = 2)))
    assert(!unflagged("B").getAs[Boolean]("isProtected"))
  }

  test("protect of an ABSENT page before its move leaves the registered target page unflagged") {
    // protectPage no-ops when titles[id] is unset; the later move's
    // getPage then registers a fresh page — a synthesized state-side row
    // must not satisfy the existence condition retroactively.
    val st = replay(Seq(protect("P", 1), move("P", "Q", 2)))
    assert(st.keySet == Set("Q"))
    assert(!st("Q").getAs[Boolean]("isProtected"))
    // Same through the deleted-gap path: the protect runs while the key
    // is empty, the move registers fresh — unflagged; but an edit landing
    // in the gap BEFORE the protect makes the page exist, so it flags.
    val viaGap = replay(
      Seq(edit("A", min = 0)),
      Seq(del("deleted &quot;[[A]]&quot; x", 1), protect("A", 2),
        move("A", "B", 3)))
    assert(!viaGap("B").getAs[Boolean]("isProtected"))
    val gapEdit = replay(
      Seq(edit("C", min = 0)),
      Seq(del("deleted &quot;[[C]]&quot; x", 1), edit("C", min = 2),
        protect("C", 3), move("C", "D", 4)))
    assert(gapEdit("D").getAs[Boolean]("isProtected"))
  }

  test("multi-hop chain of a registered fresh page: start = registering hop, updated = final hop") {
    // delete P, then P→Q→R: getPage creates the page at the FIRST move
    // (start = t2); only `updated` advances to the last hop (t3).
    val st = replay(
      Seq(edit("P", min = 0)),
      Seq(del("deleted &quot;[[P]]&quot; x", 1), move("P", "Q", 2),
        move("Q", "R", 3)))
    assert(st.keySet == Set("R"))
    assert(st("R").getAs[Long]("edits") == 0L)
    assert(st("R").getAs[Timestamp]("start") == at(2))
    assert(st("R").getAs[Timestamp]("updated") == at(3))
  }

  test("edits between a delete and a later move ride the recreated page to the move target") {
    // delete K @1 (kills Old's history), edit K @2 (recreates), move
    // K→L @3 (drags the recreated page along): L ends with ONLY the
    // post-delete edit.
    val st = replay(Seq(
      edit("K", user = "Old", min = 0),
      del("deleted &quot;[[K]]&quot; x", 1),
      edit("K", user = "New", min = 2),
      move("K", "L", 3)))
    assert(st.keySet == Set("L"))
    val l = st("L")
    assert(l.getAs[Long]("edits") == 1L)
    assert(l.getSeq[String](l.fieldIndex("contributors")) == Seq("New"))
  }

  test("incremental fold equals one-shot batch aggregation (no log events)") {
    val events = (0 until 30).map(i =>
      edit(s"P${i % 3}", user = s"u${i % 5}", min = i))
    val incremental = replay(events.grouped(7).toSeq: _*)
    val oneShot = {
      import spark.implicits._
      graft.operators.PageAggregates.pageAggregates(events.toDF(), cfg)
        .collect().map(r => r.getAs[String]("id") -> r).toMap
    }
    assert(incremental.keySet == oneShot.keySet)
    incremental.foreach { case (id, r) =>
      val o = oneShot(id)
      assert(r.getAs[Long]("edits") == o.getAs[Long]("edits"), s"edits@$id")
      assert(r.getAs[Long]("bytesChanged") == o.getAs[Long]("bytesChanged"))
      assert(r.getAs[Timestamp]("start") == o.getAs[Timestamp]("start"))
      assert(r.getAs[Timestamp]("updated") == o.getAs[Timestamp]("updated"))
      assert(r.getSeq[String](r.fieldIndex("contributors")).toSet ==
        o.getSeq[String](o.fieldIndex("contributors")).toSet)
    }
  }

  // --- bucketed incremental state table (S2/S3) ---------------------------

  private def foldToDir(dir: String, batchId: Long, events: Seq[RecentChange],
      buckets: Int = 8, sweepEvery: Int = 0): Unit = {
    import spark.implicits._
    IncrementalTrend.foldBatch(events.toDF(), dir, batchId, asOf, cfg,
      buckets, sweepEvery)
  }

  test("bucketed state: a fold under a different numBuckets fails loudly; the recorded count folds on") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Foo", min = 0)), buckets = 8)
    // A different count would silently duplicate pages across buckets —
    // the manifest records the write-time count and the fold requires it.
    val e = intercept[IllegalArgumentException] {
      foldToDir(dir, 1, Seq(edit("Foo", min = 1)), buckets = 16)
    }
    assert(e.getMessage.contains("numBuckets=8"), e.getMessage)
    // The original count still folds, and the failed attempt left no
    // committed state behind.
    foldToDir(dir, 1, Seq(edit("Foo", min = 1)), buckets = 8)
    val st = IncrementalTrend.readState(spark, dir).collect()
    assert(st.length == 1 && st.head.getAs[Long]("edits") == 2L)
  }

  test("bucketed state: multi-batch fold equals one-shot aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    val b1 = Seq(edit("Foo", min = 0), edit("Bar", user = "Ann", min = 0))
    val b2 = Seq(edit("Foo", user = "Eve", min = 1), edit("Baz", min = 1))
    foldToDir(dir, 0, b1); foldToDir(dir, 1, b2)
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st.keySet == Set("Foo", "Bar", "Baz"))
    assert(st("Foo").getAs[Long]("edits") == 2L)
    val foo = st("Foo")
    assert(foo.getSeq[String](foo.fieldIndex("contributors")).toSet ==
      Set("Jon", "Eve"))
  }

  test("bucketed state: per-batch write touches only the batch's buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Foo", min = 0), edit("Bar", min = 0),
      edit("Baz", min = 0), edit("Qux", min = 0)))
    val before = IncrementalTrend.currentManifest(spark, dir).get.entries
    // Second batch touches ONLY Foo's bucket.
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    val after = IncrementalTrend.currentManifest(spark, dir).get.entries
    // Every bucket not holding Foo must keep its EXACT data path (the
    // manifest carries untouched entries forward; their files are never
    // rewritten) — proportional-write proof.
    val changed = before.keys.filter(b =>
      after.get(b).map(_.path) != before.get(b).map(_.path)).toSet
    assert(changed.size <= 1, s"expected at most Foo's bucket to change, got $changed")
    // And the fold itself stayed correct.
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st("Foo").getAs[Long]("edits") == 2L && st.size == 4)
  }

  test("bucketed state: commit is the manifest rename — orphan data and stale temp files are ignored and swept") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Foo", min = 0)))
    // Simulate a crashed attempt of batch 1: bucket files written (under a
    // path nothing references) and a staged-but-never-renamed manifest.
    val root = new java.io.File(dir)
    val orphan = new java.io.File(root, "data/b1-deadbeef")
    assert(orphan.mkdirs())
    java.nio.file.Files.writeString(orphan.toPath.resolve("junk"), "not parquet")
    java.nio.file.Files.writeString(
      root.toPath.resolve(".manifest-cafe0123.tmp"), "{half-written")
    // Readers see only the committed manifest — batch 0's state.
    val st0 = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st0("Foo").getAs[Long]("edits") == 1L)
    // The checkpoint replays batch 1; the fold re-runs cleanly and the
    // next commit sweeps the crashed attempt's garbage.
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st("Foo").getAs[Long]("edits") == 2L)
    assert(!orphan.exists())
    assert(!root.toPath.resolve(".manifest-cafe0123.tmp").toFile.exists())
    // RetainedGenerations manifests remain (current + grace predecessors).
    assert(root.listFiles().count(_.getName.startsWith("manifest-")) ==
      IncrementalTrend.RetainedGenerations)
  }

  test("bucketed state: a damaged manifest (missing/scalar buckets node) fails loudly instead of reading as empty state") {
    // A scalar/missing buckets node used to read as EMPTY STATE: the
    // next fold would rebuild from nothing and its commit's sweep would
    // delete every live data dir of the last healthy generation. An
    // empty OBJECT stays legal (eviction can empty the state).
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Foo", min = 0)))
    val root = new java.io.File(dir)
    val live = root.listFiles().map(_.getName)
      .filter(_.startsWith("manifest-")).max
    def rewrite(content: String): Unit = {
      java.nio.file.Files.writeString(root.toPath.resolve(live), content)
      // Hadoop's ChecksumFileSystem keeps a .crc sidecar the writer
      // created — a hand-edited file fails the checksum BEFORE the
      // parser sees it; drop the sidecar so the damage guard is what
      // gets exercised.
      java.nio.file.Files.deleteIfExists(root.toPath.resolve(s".$live.crc"))
    }
    for (bad <- Seq("""{"numBuckets":64}""",
        """{"numBuckets":64,"buckets":"trunc""" + "\"}")) {
      rewrite(bad)
      val e = intercept[IllegalStateException] {
        IncrementalTrend.currentManifest(spark, dir)
      }
      assert(e.getMessage.contains("buckets node"), e.getMessage)
    }
    // Legal empty-object manifest: reads as empty state, no throw.
    rewrite("""{"numBuckets":64,"buckets":{}}""")
    assert(IncrementalTrend.currentManifest(spark, dir).get.entries.isEmpty)
  }

  test("bucketed state: compaction collapses generations, preserves rows and stamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    val root = new java.io.File(dir)
    // Three batches touching different pages → bucket files scattered
    // over three generations' data dirs.
    foldToDir(dir, 0, Seq(edit("Foo", min = 0), edit("Bar", min = 0)))
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    foldToDir(dir, 2, Seq(edit("Baz", min = 2)))
    val before = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[Long]("edits"), r.getAs[Long]("bytesChanged"))).toMap
    val entriesBefore = IncrementalTrend.currentManifest(spark, dir).get.entries
    assert(entriesBefore.values.map(_.path.split("/")(1)).toSet.size >= 2,
      "fixture should span multiple generation dirs")
    IncrementalTrend.compact(spark, dir)
    // Rows and per-bucket stamps unchanged; all entries in ONE dir.
    val after = IncrementalTrend.currentManifest(spark, dir).get.entries
    assert(after.keySet == entriesBefore.keySet)
    after.foreach { case (b, e) =>
      assert(e.lastBatchId == entriesBefore(b).lastBatchId, s"stamp@$b")
      assert(e.path.startsWith("data/compact-"), e.path)
    }
    assert(after.values.map(_.path.split("/")(1)).toSet.size == 1)
    val rows = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[Long]("edits"), r.getAs[Long]("bytesChanged"))).toMap
    assert(rows == before)
    // Replay idempotency survives compaction: re-folding batch 2 is a
    // no-op because the carried stamps still say it was applied.
    foldToDir(dir, 2, Seq(edit("Baz", min = 2)))
    val replayed = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("edits")).toMap
    assert(replayed("Baz") == before("Baz")._1)
    // And the fold keeps working on the compacted layout.
    foldToDir(dir, 3, Seq(edit("Foo", user = "Zed", min = 3)))
    val finalEdits = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("edits")).toMap
    assert(finalEdits("Foo") == 3L)
  }

  test("bucketed state: sweep retains the previous generation for in-flight readers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    val root = new java.io.File(dir)
    def manifests = root.listFiles().map(_.getName)
      .filter(_.startsWith("manifest-")).sorted.toSeq
    foldToDir(dir, 0, Seq(edit("Foo", min = 0)))
    val gen1 = manifests
    // A reader resolves the CURRENT manifest lazily (no action yet)…
    val inFlight = IncrementalTrend.readState(spark, dir)
    // …then one more commit lands, rewriting Foo's bucket.
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    // The previous generation (manifest + its bucket files) survives one
    // commit, so the in-flight plan still scans cleanly…
    assert(manifests.size == 2 && manifests.containsSlice(gen1))
    val rows = inFlight.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(rows("Foo").getAs[Long]("edits") == 1L) // its snapshot, intact
    // …and dies only after a SECOND commit (grace = RetainedGenerations−1).
    foldToDir(dir, 2, Seq(edit("Foo", user = "Zed", min = 2)))
    assert(!manifests.containsSlice(gen1))
    assert(manifests.size == IncrementalTrend.RetainedGenerations)
  }

  test("bucketed state: replaying a committed batch is a no-op (idempotent)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Foo", min = 0)))
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    // Checkpoint replay after a crash re-invokes foldBatch with the same
    // batchId; the bucket's lastBatchId stamp must make it a no-op instead
    // of double-counting the additive merge.
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st("Foo").getAs[Long]("edits") == 2L)
    assert(st("Foo").getSeq[String](st("Foo").fieldIndex("contributors")).toSet ==
      Set("Jon", "Eve"))
  }

  test("bucketed state: replaying the batch that EMPTIED a bucket cannot resurrect the evicted page") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    // Lifespan-driven eviction: nothing else evicts (speed 0, huge
    // inactivity), so the page dies only because its merged history is
    // old — which is exactly the state a replay against an EMPTY prior
    // bucket would lose.
    val evict = TrendConfig(minSpeed = 0.0, maxInactivityMins = 1000000,
      maxLifespanMins = 5, minPurgeTimeMins = 1)
    IncrementalTrend.foldBatch(Seq(edit("Old", min = 0)).toDF(), dir, 1,
      at(1).getTime, evict, 4, 0)
    assert(IncrementalTrend.readState(spark, dir).count() == 1)
    // Batch 2 touches Old's bucket and the merged page (start = min 0,
    // age 10 > 5) evicts — the only page, so the bucket EMPTIES.
    val b2 = Seq(edit("Old", user = "Eve", min = 9))
    IncrementalTrend.foldBatch(b2.toDF(), dir, 2, asOf, evict, 4, 0)
    assert(IncrementalTrend.readState(spark, dir).count() == 0)
    // Crash-replay of batch 2: without the tombstone stamp the bucket
    // reads as pending with EMPTY prior state, the delta alone looks
    // 1 minute old, and the evicted page resurrects with truncated
    // history. The tombstone's lastBatchId makes it a no-op.
    IncrementalTrend.foldBatch(b2.toDF(), dir, 2, asOf, evict, 4, 0)
    assert(IncrementalTrend.readState(spark, dir).count() == 0)
  }

  test("bucketed state: legacy pre-manifest dir (no stamp column) is adopted in place") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    // Build the legacy layout directly: root bucket=N partition dirs,
    // no manifest, no lastBatchId column (the oldest on-disk format).
    IncrementalTrend.replay(spark, Seq(Seq(edit("Foo", min = 0))), asOf, cfg)
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(1L)).cast("int"))
      .write.partitionBy("bucket").parquet(dir)
    foldToDir(dir, 5, Seq(edit("Foo", user = "Eve", min = 1)), buckets = 1)
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st("Foo").getAs[Long]("edits") == 2L)
    // The adopted dir is now manifest-committed and the touched legacy
    // bucket migrated into a manifest data dir — but the adoption
    // manifest was MATERIALIZED before the commit, so the legacy dir
    // gets the same one-generation reader grace as any predecessor
    // (pre-fix, the synthesized generation existed nowhere on disk and
    // the first commit swept legacy dirs out from under lazy readers).
    val m = IncrementalTrend.currentManifest(spark, dir).get
    assert(m.entries.values.forall(_.path.startsWith("data/")))
    assert(new java.io.File(dir, "bucket=0").exists())
    // The second commit retires the adoption generation for real.
    foldToDir(dir, 6, Seq(edit("Foo", user = "Zed", min = 2)), buckets = 1)
    assert(!new java.io.File(dir, "bucket=0").exists())
    val st2 = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st2("Foo").getAs[Long]("edits") == 3L)
  }

  test("bucketed state: crash between adoption data write and first manifest commit recovers") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    // Legacy layout on disk...
    IncrementalTrend.replay(spark, Seq(Seq(edit("Foo", min = 0))), asOf, cfg)
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(1L)).cast("int"))
      .write.partitionBy("bucket").parquet(dir)
    // ...plus the debris of an adoption fold that crashed AFTER writing
    // its data dir but BEFORE the manifest rename: orphan parquet at a
    // DIFFERENT directory depth than the legacy bucket dirs. Recovery
    // must not trip partition discovery over the mixed layout.
    IncrementalTrend.replay(spark, Seq(Seq(edit("Foo", min = 0))), asOf, cfg)
      .withColumn("bucket", lit(0))
      .write.partitionBy("bucket").parquet(dir + "/data/b5-deadbeef")
    assert(IncrementalTrend.readState(spark, dir).count() == 1) // not wedged
    foldToDir(dir, 5, Seq(edit("Foo", user = "Eve", min = 1)), buckets = 1)
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st("Foo").getAs[Long]("edits") == 2L) // replay folded once
    assert(!new java.io.File(dir, "data/b5-deadbeef").exists()) // swept
  }

  test("bucketed state: legacy per-bucket stamps resume each bucket at its own position") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64, when}
    // Two titles landing in DIFFERENT buckets of a 2-bucket table.
    val bucketOf = (id: String) => spark.range(1)
      .select(pmod(xxhash64(lit(id)), lit(2L)).cast("int")).head().getInt(0)
    val candidates = Seq("Foo", "Bar", "Baz", "Qux", "Quux", "Corge")
    val a = candidates.head
    val b = candidates.find(t => bucketOf(t) != bucketOf(a)).get
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    // Legacy layout stamped as the pre-manifest writer would after a crash
    // INSIDE batch 1's per-partition commit loop: page `a`'s bucket
    // already carries batch 1 (applied), page `b`'s bucket still shows
    // batch 0 (pending).
    IncrementalTrend.replay(spark,
        Seq(Seq(edit(a, min = 0), edit(b, min = 0), edit(a, user = "Eve", min = 1))),
        asOf, cfg)
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(2L)).cast("int"))
      .withColumn("lastBatchId",
        when(col("id") === a, lit(1L)).otherwise(lit(0L)))
      .write.partitionBy("bucket").parquet(dir)
    // The checkpoint replays batch 1, which touched BOTH pages: `a`'s
    // bucket must be skipped (its edit is already folded), `b`'s folded.
    foldToDir(dir, 1,
      Seq(edit(a, user = "Eve", min = 1), edit(b, user = "Eve", min = 1)),
      buckets = 2)
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st(a).getAs[Long]("edits") == 2L, s"bucket of $a must not double-count")
    assert(st(b).getAs[Long]("edits") == 2L, s"bucket of $b must catch up")
  }

  test("bucketed state: delete empties its bucket dir when last page goes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Doomed", min = 0)), buckets = 1)
    assert(IncrementalTrend.readState(spark, dir).count() == 1)
    foldToDir(dir, 1, Seq(del("deleted &quot;[[Doomed]]&quot; gone", 1)), buckets = 1)
    assert(IncrementalTrend.readState(spark, dir).count() == 0)
  }

  test("bucketed state: full sweep evicts idle pages in untouched buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    // Tight eviction: everything idles out immediately past the grace period.
    val evict = TrendConfig(minSpeed = 1000.0, maxInactivityMins = 1,
      maxLifespanMins = 1, minPurgeTimeMins = 1)
    import spark.implicits._
    IncrementalTrend.foldBatch(Seq(edit("Old", min = 0)).toDF(), dir, 1,
      at(0).getTime + 30000, evict, 4, 10) // batchId 1: no sweep, within grace
    assert(IncrementalTrend.readState(spark, dir).count() == 1)
    // Batch 10 (sweep) carries NO events for Old's bucket, but the sweep
    // applies the eviction policy to the whole table at asOf = +10 min.
    IncrementalTrend.foldBatch(Seq.empty[RecentChange].toDF(), dir, 10,
      asOf, evict, 4, 10)
    assert(IncrementalTrend.readState(spark, dir).count() == 0)
  }
}
