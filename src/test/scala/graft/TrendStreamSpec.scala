package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.{LogParams, PageState, RecentChange, TrendConfig}
import graft.operators.PageAggregates
import graft.streaming.{TrendStream, TrendStreamTws}
import graft.streaming.TrendStream.ClassifiedEvent

/** Streaming core spec: fixture parity for the pure update function,
  * eviction-policy boundaries, and the stream ≡ batch identity (SURVEY
  * §5.2 items 1-2, 5).
  */
class TrendStreamSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(s: String) = Timestamp.valueOf(s)

  private def ce(
      id: String = "Foo", user: String = "Jon", isBot: Boolean = false,
      isRevert: Boolean = false, isAnon: Boolean = false, isNew: Boolean = false,
      notab: Long = 0, volat: Long = 0, delta: Long = 1,
      logAction: String = null, at: Timestamp = t0): ClassifiedEvent =
    ClassifiedEvent(id, id, "", user, isBot, isRevert, isAnon, isNew,
      notab, volat, delta, logAction, at)

  private def empty(at: Timestamp = t0) = PageState.empty("Foo", "Foo", "", at)

  test("stream update: a late-delivered older edit in a LATER batch cannot regress the stamps (monotone updated/start)") {
    // Within one invocation the ts sort orders events; ACROSS
    // micro-batches a late delivery used to set updated = e.ts
    // unconditionally, regressing the idle clock below the batch twin's
    // max(ts) (and IncrementalTrend's greatest merge) — a live page
    // could then evict at the next survives() check while the batch
    // twin kept it. Batch-split invariance is the contract:
    // apply([a]) then apply([b]) ≡ apply([a, b]).
    val t10 = ts("2024-01-01 00:10:00"); val t5 = ts("2024-01-01 00:05:00")
    val twoBatches = TrendStream.applyEvents(
      TrendStream.applyEvents(None, Seq(ce(at = t10))),
      Seq(ce(user = "Ann", at = t5))).get
    val oneBatch = TrendStream.applyEvents(None,
      Seq(ce(at = t10), ce(user = "Ann", at = t5))).get
    assert(twoBatches.updated == t10 && twoBatches.start == t5)
    assert(twoBatches.updated == oneBatch.updated &&
      twoBatches.start == oneBatch.start &&
      twoBatches.edits == oneBatch.edits)
  }

  // --- applyEvents fixture parity (reference test/tests.js) --------------

  test("stream update: edit accounting (tests.js:38-51)") {
    val s = TrendStream.applyEvents(Some(empty()), Seq(ce())).get
    assert(s.edits == 1 && s.bytesChanged == 1)
    assert(s.contributors == Seq("Jon") && s.distribution == Map("Jon" -> 1L))
  }

  test("stream update: same-timestamp interleavings apply in a deterministic order (input order irrelevant)") {
    // The group iterator arrives in shuffle order; a ts-only stable sort
    // preserved it, so a same-second edit/delete pair (or the
    // contributors append order) flipped between runs and checkpoint
    // replays. Phase order within a tick: edits first, then delete,
    // protect, commands.
    val edit = ce(user = "A", at = t0)
    val edit2 = ce(user = "B", at = t0)
    val del = ce(logAction = "delete", at = t0)
    for (perm <- Seq(edit, edit2, del).permutations.toSeq) {
      assert(TrendStream.applyEvents(Some(empty()), perm).isEmpty,
        s"edits ride pre-delete state; delete wins the tick: $perm")
    }
    val c1 = TrendStream.applyEvents(None, Seq(edit, edit2)).get
    val c2 = TrendStream.applyEvents(None, Seq(edit2, edit)).get
    assert(c1.contributors == c2.contributors, "append order must not " +
      "depend on arrival order")
  }

  test("stream update: same-tick COMMANDS order deterministically (logAction in the key); null fields never NPE the sort") {
    // markSafe and unmarkSafe at the same ts share every other tie-break
    // field (phase 3, user "", delta 0) — only logAction separates them,
    // so omitting it from the sort key left a shuffle-order coin on the
    // final safe flag. Lexicographic: cmd:markSafe < cmd:unmarkSafe, so
    // unmark applies second and wins the tick from either arrival order.
    val mark = ce(logAction = "cmd:markSafe", delta = 0)
    val unmark = ce(logAction = "cmd:unmarkSafe", delta = 0)
    for (perm <- Seq(mark, unmark).permutations.toSeq) {
      val s = TrendStream.applyEvents(Some(empty()), perm).get
      assert(!s.safe, s"unmark wins the tick under any arrival order: $perm")
    }
    // Null user (rev-deleted wire field) on two tied edits: the sort key
    // must coalesce, not NPE in String.compareTo.
    val n1 = ce(user = null)
    val n2 = ce(user = null, delta = 2)
    val s2 = TrendStream.applyEvents(Some(empty()), Seq(n1, n2)).get
    assert(s2.bytesChanged == 3L)
  }

  test("stream update: cmd:unmarkSafe revokes the eviction exemption (reference markSafe unsafe=true)") {
    val marked = TrendStream.applyEvents(Some(empty()),
      Seq(ce(logAction = "cmd:markSafe", at = t0))).get
    assert(marked.safe)
    val revoked = TrendStream.applyEvents(Some(marked),
      Seq(ce(logAction = "cmd:unmarkSafe", at = ts("2024-01-01 00:01:00")))).get
    assert(!revoked.safe)
  }

  test("stream update: bot edits count nowhere (tests.js:80-95)") {
    val s = TrendStream.applyEvents(Some(empty()), Seq(ce(isBot = true))).get
    assert(s.edits == 0 && s.bytesChanged == 0 && s.contributors.isEmpty)
  }

  test("stream update: revert counted, not an edit (tests.js:97-109)") {
    val s = TrendStream.applyEvents(Some(empty()), Seq(ce(isRevert = true, user = "Reverter"))).get
    assert(s.reverts == 1 && s.edits == 0 && s.contributors.isEmpty)
    assert(s.bytesChanged == 1) // reverts apply delta
  }

  test("stream update: bot revert still changes bytes (tests.js:111-122)") {
    val s = TrendStream.applyEvents(Some(empty()),
      Seq(ce(isBot = true, isRevert = true, user = "Reverter"))).get
    assert(s.reverts == 1 && s.bytesChanged == 1 && s.edits == 0)
  }

  test("stream update: anon edit increments both counters and anons set") {
    val s = TrendStream.applyEvents(Some(empty()),
      Seq(ce(user = "192.168.0.1", isAnon = true), ce())).get
    assert(s.edits == 2 && s.anonEdits == 1)
    assert(s.anons == Seq("192.168.0.1") && s.contributors == Seq("Jon"))
    assert(s.distribution == Map("192.168.0.1" -> 1L, "Jon" -> 1L))
  }

  test("stream update: delete drops state; later edit recreates fresh (A6)") {
    val gone = TrendStream.applyEvents(Some(empty()), Seq(ce(), ce(logAction = "delete", at = ts("2024-01-01 00:01:00"))))
    assert(gone.isEmpty)
    val recreated = TrendStream.applyEvents(Some(empty()), Seq(
      ce(),
      ce(logAction = "delete", at = ts("2024-01-01 00:01:00")),
      ce(user = "Ann", at = ts("2024-01-01 00:02:00")))).get
    assert(recreated.edits == 1 && recreated.contributors == Seq("Ann"))
  }

  test("stream update: protect sets flag (A5)") {
    val s = TrendStream.applyEvents(Some(empty()),
      Seq(ce(), ce(logAction = "protect", at = ts("2024-01-01 00:01:00")))).get
    assert(s.isProtected && s.edits == 1)
  }

  test("stream update: events apply in ts order (updated = last ts)") {
    val s = TrendStream.applyEvents(Some(empty()), Seq(
      ce(at = ts("2024-01-01 00:05:00")), ce(at = t0))).get
    assert(s.updated == ts("2024-01-01 00:05:00"))
  }

  test("stream update: unhandled log actions are NOT edits (move/block/patrol)") {
    // The reference routes moves to renamePage and ignores other log
    // actions (index.js:320-337); none may inflate edit counters.
    val s = TrendStream.applyEvents(Some(empty()), Seq(
      ce(), ce(logAction = "move", at = ts("2024-01-01 00:01:00")),
      ce(logAction = "block", at = ts("2024-01-01 00:02:00")),
      ce(logAction = "patrol", at = ts("2024-01-01 00:03:00")))).get
    assert(s.edits == 1 && s.contributors == Seq("Jon"))
    assert(s.updated == t0) // log noise doesn't touch the page
  }

  test("stream update: log-only group on absent page creates no state (A5)") {
    assert(TrendStream.applyEvents(None, Seq(ce(logAction = "protect"))).isEmpty)
    assert(TrendStream.applyEvents(None, Seq(ce(logAction = "move"))).isEmpty)
    assert(TrendStream.applyEvents(None, Seq(ce(logAction = "cmd:markSafe"))).isEmpty)
  }

  test("stream update: cmd:drop removes state; cmd:markSafe sets safe (Q4)") {
    val dropped = TrendStream.applyEvents(Some(empty()),
      Seq(ce(), ce(logAction = "cmd:drop", at = ts("2024-01-01 00:01:00"))))
    assert(dropped.isEmpty)
    val safe = TrendStream.applyEvents(Some(empty()),
      Seq(ce(), ce(logAction = "cmd:markSafe", at = ts("2024-01-01 00:01:00")))).get
    assert(safe.safe && safe.edits == 1)
    // markSafe exempts the page from the speed/idle policy (index.js:379).
    assert(TrendStream.survives(safe, ts("2024-01-01 03:00:00").getTime, TrendConfig()))
  }

  // --- eviction policy (A7, index.js:370-392) ----------------------------

  private val cfg = TrendConfig()
  private def stateAt(start: String, updated: String, edits: Long = 1,
      safe: Boolean = false): PageState =
    empty(ts(start)).copy(edits = edits, updated = ts(updated), safe = safe)

  test("eviction: grace period — young pages always survive") {
    val s = stateAt("2024-01-01 00:00:00", "2024-01-01 00:00:00")
    assert(TrendStream.survives(s, ts("2024-01-01 00:04:00").getTime, cfg))
  }

  test("eviction: slow page dropped after grace") {
    val s = stateAt("2024-01-01 00:00:00", "2024-01-01 00:05:30", edits = 1)
    // age 6 min, speed = 1/6 < 3 → drop
    assert(!TrendStream.survives(s, ts("2024-01-01 00:06:00").getTime, cfg))
  }

  test("eviction: fast page survives until idle > maxInactivity") {
    // 1000 edits in 100 min → speed 10 > 3; idle 30 min < 60 → keep
    val s = stateAt("2024-01-01 00:00:00", "2024-01-01 01:10:00", edits = 1000)
    assert(TrendStream.survives(s, ts("2024-01-01 01:40:00").getTime, cfg))
    // idle 70 min > 60 → drop
    assert(!TrendStream.survives(s, ts("2024-01-01 02:20:00").getTime, cfg))
  }

  test("eviction: safe exempts policy but not maxLifespan (index.js:379-389)") {
    val s = stateAt("2024-01-01 00:00:00", "2024-01-01 00:00:30", safe = true)
    // slow + idle but safe → keep (age 2 h < 24 h)
    assert(TrendStream.survives(s, ts("2024-01-01 02:00:00").getTime, cfg))
    // age 25 h > 24 h lifespan → drop even though safe
    assert(!TrendStream.survives(s, ts("2024-01-02 01:00:00").getTime, cfg))
  }

  test("eviction: backlog catch-up does not mass-evict — the data-path clock tracks event time") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // Recovery after an outage: wall-clock nowMs is 3 days past the
    // event stream, but the page is ACTIVE in stream time (edited one
    // minute after its last state stamp). With the old wall-clock
    // data-path policy the replayed state read as >maxInactivity idle
    // and was evicted mid-catch-up; the clock is min(wall, newest
    // event), so live streams keep the reference cleaner's semantics.
    val live = stateAt("2024-01-01 00:00:00", "2024-01-01 01:00:00",
      edits = 1000) // fast page, 1 h old in EVENT time
    val wallMs = ts("2024-01-04 00:00:00").getTime // 3-day outage
    val st = TestGroupState.create[PageState](
      org.apache.spark.api.java.Optional.of(live),
      GroupStateTimeout.ProcessingTimeTimeout(), wallMs,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out = TrendStream.updateFn(cfg, armTimers = true)(
      "Foo", Iterator(ce(at = ts("2024-01-01 01:01:00"))), st).toSeq
    assert(out.nonEmpty && !st.isRemoved,
      "an actively-edited page must survive backlog replay")
    assert(out.head.edits == 1001L)
  }

  test("eviction: data path drops an ACTIVE page past maxLifespan when the cleaner is on") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // A page edited every few seconds never goes idle long enough for its
    // processing-time timeout to fire — the data path itself must apply
    // the cleaner policy (reference cleaner + batch survivors drop on age
    // regardless of activity).
    val old = stateAt("2024-01-01 00:00:00", "2024-01-02 00:59:00",
      edits = 100000) // fast page, age 25 h > 24 h lifespan
    val nowMs = ts("2024-01-02 01:00:00").getTime
    def run(armTimers: Boolean) = {
      val st = TestGroupState.create[PageState](
        org.apache.spark.api.java.Optional.of(old),
        GroupStateTimeout.ProcessingTimeTimeout(), nowMs,
        org.apache.spark.api.java.Optional.empty[Long](),
        hasTimedOut = false)
      val out = TrendStream.updateFn(cfg, armTimers)(
        "Foo", Iterator(ce(at = ts("2024-01-02 00:59:30"))), st).toSeq
      (out, st.isRemoved)
    }
    val (outLive, removedLive) = run(armTimers = true)
    assert(outLive.isEmpty && removedLive, "live cleaner must age the page out")
    // Finite replays (cleaner off) keep the historical semantics: state
    // times vs wall-clock are meaningless there.
    val (outReplay, removedReplay) = run(armTimers = false)
    assert(outReplay.nonEmpty && !removedReplay)
  }

  // --- stream ≡ batch ----------------------------------------------------

  private def rc(
      title: String = "Foo", comment: String = "yo", user: String = "Jon",
      bot: Boolean = false, rcType: String = "edit",
      lengthOld: Long = 1L, lengthNew: Long = 2L, wiki: String = "enwiki",
      at: Timestamp = t0): RecentChange =
    RecentChange(title, comment, 0, user, bot, rcType, lengthOld, lengthNew,
      wiki, "en.wikipedia.org", null, null, null, null, at)

  test("classify drops a null-ts wire event instead of NPE-killing the query") {
    // A recentchange message missing meta.dt decodes to ts = null;
    // applyEvents orders by ts, so without the classify guard one
    // malformed message crashed the whole stream (round-9 null-ts rule).
    val events = Seq(
      rc(title = "Foo", at = t0),
      rc(title = "Foo", user = "Eve", at = null))
    val snap = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_null_ts")
    assert(snap.map(_.id) == Seq("Foo"))
    assert(snap.head.edits == 1L && snap.head.contributors == Seq("Jon"))
  }

  test("wire log rows cannot forge control commands: a logAction spelling cmd:* demotes to an inert log action") {
    // The cmd: namespace belongs to commandEvents (the control channel);
    // a wire log row with logAction='cmd:drop' used to flow through
    // classify verbatim and EXECUTE in applyEvents — wiping the page's
    // state without the A6 delete gate ('cmd:markSafe' would likewise
    // exempt a page from eviction forever) from one adversarial feed
    // row the batch path ignores entirely.
    val events = Seq(
      rc(title = "Foo", at = t0),
      RecentChange("Foo", "yo", 0, "Mallory", false, "log", 1L, 2L,
        "enwiki", "en.wikipedia.org", "block", "cmd:drop", null, null,
        new Timestamp(t0.getTime + 1000L)))
    val snap = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_cmd_forgery")
    assert(snap.map(_.id) == Seq("Foo"),
      "page state survives the forged cmd:drop")
    assert(snap.head.edits == 1L && snap.head.contributors == Seq("Jon"),
      "the forged row neither drops state nor mints an edit")
  }

  test("falsy log_type: a log_type=\"\" event is a plain EDIT in stream AND batch (index.js:320 truthy dispatch)") {
    // The reference dispatches log events on JS truthiness
    // (`else if (data.log_type)`) — log_type="" is falsy, so the event is
    // a REAL EDIT there. isNull/isNotNull routing sent it down the log
    // branch (where a null logAction gates it out) and the edit vanished
    // from every path.
    val events = Seq(
      rc(title = "Foo", user = "Jon", at = t0),
      RecentChange("Foo", "yo", 0, "Ann", false, "edit", 1L, 3L,
        "enwiki", "en.wikipedia.org", "", null, null, null,
        new Timestamp(t0.getTime + 1000L)))
    val batch = PageAggregates.pageAggregates(events.toDS().toDF()).collect()
    assert(batch.length == 1)
    val row = batch.head
    assert(row.getAs[Long]("edits") == 2L, "log_type=\"\" counts as an edit")
    assert(row.getAs[scala.collection.Seq[String]]("contributors").toList == List("Ann", "Jon"))
    assert(row.getAs[Long]("bytesChanged") == 3L, "its delta applies too")
    val snap = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_falsy_logtype")
    assert(snap.map(_.id) == Seq("Foo"))
    assert(snap.head.edits == 2L &&
      snap.head.contributors == Seq("Jon", "Ann"),
      "stream routes the falsy log_type event as an edit like batch")
  }

  test("null-ts edit rows: batch drops them like the stream (stream ≡ batch on a malformed feed row)") {
    // classify drops null-ts events (applyEvents orders by ts); batch
    // used to COUNT them (then NULL start/updated) — one malformed wire
    // row split the engine's central identity.
    val events = Seq(
      rc(title = "Foo", user = "Jon", at = t0),
      rc(title = "Foo", user = "Eve", at = null))
    val batch = PageAggregates.pageAggregates(events.toDS().toDF()).collect()
    assert(batch.length == 1)
    assert(batch.head.getAs[Long]("edits") == 1L &&
      batch.head.getAs[scala.collection.Seq[String]]("contributors").toList ==
        List("Jon"),
      "batch must not count the null-ts edit the stream drops")
    assert(batch.head.getAs[Timestamp]("start") == t0)
    val streamed = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_null_ts_identity").map(s => s.id -> s).toMap
    checkStreamEqualsBatch(streamed,
      batch.map(r => r.getAs[String]("id") -> r).toMap)
  }

  test("MemoryStream replay equals batch aggregation (SURVEY §2.3 identity)") {
    // A deterministic pseudo-random mix over 3 pages / 6 editors incl.
    // anons, bots, reverts, AfD comments, multiple wikis.
    val rnd = new scala.util.Random(42)
    val pages = Seq(("Foo", "enwiki"), ("Bar", "enwiki"), ("Baz", "dewiki"))
    val users = Seq("Jon", "Ann", "ClueBot NG", "192.168.0.1", "Bot9", "Eve")
    val comments = Seq("yo", "reverted vandalism", "Nominated page for deletion",
      "current event update", "copyedit")
    val events = (0 until 200).map { i =>
      val (t, w) = pages(rnd.nextInt(pages.size))
      rc(title = t, wiki = w,
        comment = comments(rnd.nextInt(comments.size)),
        user = users(rnd.nextInt(users.size)),
        bot = rnd.nextInt(10) == 0,
        rcType = if (rnd.nextInt(20) == 0) "new" else "edit",
        lengthOld = rnd.nextInt(1000).toLong,
        lengthNew = rnd.nextInt(1000).toLong,
        at = new Timestamp(t0.getTime + i * 1000L))
    }

    val streamed = TrendStream.replayToSnapshot(spark, events)
      .map(s => s.id -> s).toMap
    val batch = PageAggregates.pageAggregates(events.toDS().toDF()).collect()
      .map(r => r.getAs[String]("id") -> r).toMap

    assert(streamed.keySet == batch.keySet)
    checkStreamEqualsBatch(streamed, batch)
  }

  private def checkStreamEqualsBatch(streamed: Map[String, PageState],
      batch: Map[String, org.apache.spark.sql.Row]): Unit = {
    streamed.foreach { case (id, s) =>
      val b = batch(id)
      assert(s.edits == b.getAs[Long]("edits"), s"edits@$id")
      assert(s.anonEdits == b.getAs[Long]("anonEdits"), s"anonEdits@$id")
      assert(s.reverts == b.getAs[Long]("reverts"), s"reverts@$id")
      assert(s.bytesChanged == b.getAs[Long]("bytesChanged"), s"bytes@$id")
      assert(s.isNew == b.getAs[Boolean]("isNew"), s"isNew@$id")
      assert(s.notabilityFlags == b.getAs[Long]("notabilityFlags"), s"notab@$id")
      assert(s.volatileFlags == b.getAs[Long]("volatileFlags"), s"volat@$id")
      assert(s.start == b.getAs[Timestamp]("start"), s"start@$id")
      assert(s.updated == b.getAs[Timestamp]("updated"), s"updated@$id")
      assert(s.contributors.toSet ==
        b.getSeq[String](b.fieldIndex("contributors")).toSet, s"contributors@$id")
      assert(s.anons.toSet ==
        b.getSeq[String](b.fieldIndex("anons")).toSet, s"anons@$id")
    }
  }

  // --- Q4 streaming control channel --------------------------------------

  test("streaming drop command removes a page mid-stream (tests.js:53-61)") {
    val events = Seq(
      rc(title = "Foo", at = t0),
      rc(title = "Bar", user = "Ann", at = ts("2024-01-01 00:00:30")),
      // Post-drop edit: the page must come back FRESH, not accumulated.
      rc(title = "Foo", user = "Eve", at = ts("2024-01-01 00:02:00")))
    val cmds = Seq(
      TrendStream.TrendCommand("drop", "enwiki", "Foo", ts("2024-01-01 00:01:00")))
    val snap = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_cmd_drop", commands = cmds).map(s => s.id -> s).toMap
    assert(snap("Foo").edits == 1 && snap("Foo").contributors == Seq("Eve"))
    assert(snap("Bar").edits == 1) // untargeted page unaffected
  }

  test("a null-action command is dropped — it must not mint a phantom edit") {
    // concat null-propagates: an unguarded null action produced a NULL
    // logAction, which is applyEvents' EDIT branch — the malformed
    // command created pages / bumped edit counts with contributor "".
    val events = Seq(rc(title = "Foo", at = t0))
    val cmds = Seq(
      TrendStream.TrendCommand(null, "enwiki", "Foo", ts("2024-01-01 00:01:00")),
      TrendStream.TrendCommand(null, "enwiki", "Ghost", ts("2024-01-01 00:01:00")))
    val snap = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_cmd_nullact", commands = cmds).map(s => s.id -> s).toMap
    assert(snap.keySet == Set("Foo"), snap.keySet) // no Ghost page minted
    assert(snap("Foo").edits == 1 &&
      snap("Foo").contributors == Seq("Jon"))
  }

  test("streaming markSafe command flags the page (index.js:409-411)") {
    val events = Seq(rc(title = "Foo", at = t0))
    val cmds = Seq(
      TrendStream.TrendCommand("markSafe", "enwiki", "Foo", ts("2024-01-01 00:01:00")))
    val snap = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_cmd_safe", commands = cmds).map(s => s.id -> s).toMap
    assert(snap("Foo").safe && snap("Foo").edits == 1)
  }

  // --- transformWithState twin (Spark 4 arbitrary-state v2) ---------------

  test("transformWithState replay equals fgws replay and batch aggregation") {
    val rnd = new scala.util.Random(7)
    val pages = Seq(("Foo", "enwiki"), ("Bar", "enwiki"), ("Baz", "dewiki"))
    val users = Seq("Jon", "Ann", "ClueBot NG", "192.168.0.1", "Bot9", "Eve")
    val comments = Seq("yo", "reverted vandalism", "Nominated page for deletion",
      "current event update", "copyedit")
    val events = (0 until 150).map { i =>
      val (t, w) = pages(rnd.nextInt(pages.size))
      rc(title = t, wiki = w,
        comment = comments(rnd.nextInt(comments.size)),
        user = users(rnd.nextInt(users.size)),
        bot = rnd.nextInt(10) == 0,
        rcType = if (rnd.nextInt(20) == 0) "new" else "edit",
        lengthOld = rnd.nextInt(1000).toLong,
        lengthNew = rnd.nextInt(1000).toLong,
        at = new Timestamp(t0.getTime + i * 1000L))
    }
    val tws = TrendStreamTws.replayToSnapshot(spark, events)
      .map(s => s.id -> s).toMap
    val batch = PageAggregates.pageAggregates(events.toDS().toDF()).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(tws.keySet == batch.keySet)
    checkStreamEqualsBatch(tws, batch)
    val fgws = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_fgws_vs_tws").map(s => s.id -> s).toMap
    assert(tws.keySet == fgws.keySet)
    tws.foreach { case (id, s) => assert(s == fgws(id), s"tws!=fgws@$id") }
  }

  test("transformWithState: drop command and delete semantics (A6/Q4)") {
    val events = Seq(
      rc(title = "Foo", at = t0),
      rc(title = "Foo", user = "Eve", at = ts("2024-01-01 00:02:00")))
    val cmds = Seq(
      TrendStream.TrendCommand("drop", "enwiki", "Foo", ts("2024-01-01 00:01:00")))
    val snap = TrendStreamTws.replayToSnapshot(spark, events,
      queryName = "tws_cmd_drop", commands = cmds).map(s => s.id -> s).toMap
    // Drop lands between the edits (ts order): Foo comes back fresh.
    assert(snap("Foo").edits == 1 && snap("Foo").contributors == Seq("Eve"))
  }

  test("transformWithState: terminal drop (no later edit) survives a TimeMode.None replay") {
    // Regression: the None/cleared branches called listTimers/deleteTimer
    // unconditionally, and timer ops THROW under TimeMode.None (the
    // evict=false replay mode) — a drop that is NOT followed by a
    // same-batch edit, or a log-only event on an absent page, killed the
    // whole replay query. Timer cleanup is now gated like arming.
    val events = Seq(
      rc(title = "Foo", at = t0),
      rc(title = "Keep", at = t0),
      // Log-only event on an ABSENT page: applyEvents -> None.
      RecentChange("Ghost", "deleted", 0, "Admin", false, "log", 0L, 0L,
        "enwiki", "en.wikipedia.org", "delete", "delete",
        LogParams.ofMap(Map.empty), "deleted page [[Ghost]]",
        ts("2024-01-01 00:01:00")))
    val cmds = Seq( // terminal drop: nothing recreates Foo afterwards
      TrendStream.TrendCommand("drop", "enwiki", "Foo",
        ts("2024-01-01 00:02:00")))
    val snap = TrendStreamTws.replayToSnapshot(spark, events,
        queryName = "tws_terminal_drop", commands = cmds)
      .map(s => s.id -> s).toMap
    assert(snap.keySet == Set("Keep"))
  }

  test("log_params wire variants dispatch like the reference's !params.length on all three forms (index.js:329)") {
    // The gate is duck-typed JS: `!params.length` — absent params and ANY
    // object pass (objects have no .length), an array/string passes iff
    // empty. The wire JSON goes through decodeWire so the variant PARSE
    // (token-type, not text-sniffing) is in the loop end to end.
    def wireDelete(lp: Option[String]): String = {
      val lpField = lp.map(v => s""""log_params":$v,""").getOrElse("")
      s"""{"title":"Src","comment":"x","namespace":0,"user":"Admin",""" +
        s""""bot":false,"type":"log","length":{"old":0,"new":0},""" +
        s""""wiki":"enwiki","server_name":"en.wikipedia.org",""" +
        s""""log_type":"delete","log_action":"delete",$lpField""" +
        s""""log_action_comment":"deleted &quot;[[Target]]&quot;",""" +
        s""""meta":{"dt":"2024-01-01T00:00:00Z"}}"""
    }
    val cases = Seq( // (log_params JSON, reference gate open?)
      (None, true),                                  // absent → !undefined
      (Some("null"), true),                          // JSON null → !undefined
      (Some("{}"), true),                            // object: no .length
      (Some("""{"target":"x","count":"1"}"""), true), // NON-empty object too
      // A literal "length" ENTRY duck-types through JS property access:
      // {length:"2"}.length is "2" (truthy → gate closed); empty → open.
      (Some("""{"length":"2"}"""), false),
      (Some("""{"length":""}"""), true),
      (Some("[]"), true),                            // [].length = 0
      (Some("""["0","1"]"""), false),                // legacy array: length 2
      (Some("\"\""), true),                          // "".length = 0
      (Some("\"legacy text\""), false),              // string: length 11
      // Scalar NON-STRING forms: a number/boolean has no .length in JS
      // (!undefined = OPEN). The decode detects the token type with a
      // Double/Boolean single-field parse — the raw StringType capture
      // reads 5 as '5' (length 1, closed), the parity hole this pins.
      (Some("5"), true),
      (Some("true"), true),
      // The STRING "5" stays a string: JS "5".length = 1 → closed (the
      // scalar detector must not coerce it).
      (Some("\"5\""), false))
    for (((lp, open), i) <- cases.zipWithIndex) {
      val decoded = graft.sources.EventAdapter.decodeWire(
        Seq(wireDelete(lp)).toDF("value")).as[RecentChange]
      val out = TrendStream.classify(decoded, TrendConfig()).collect()
      assert(out.length == 1, s"case $i: one classified event")
      val expected = if (open) "delete" else "log:gated"
      assert(out.head.logAction == expected,
        s"case $i (log_params=${lp.getOrElse("<absent>")}): " +
          s"expected $expected, got ${out.head.logAction}")
      if (open) assert(out.head.id == "Target",
        s"case $i: qualifying delete re-keys onto the comment target")
    }
    // Move target rides the MAP form only (params.target is JS undefined
    // on an array/string — the reference's property access on index.js:324).
    val moveWire = (lp: String) =>
      s"""{"title":"Foo","comment":"moved","namespace":0,"user":"Admin",""" +
        s""""bot":false,"type":"log","length":{"old":0,"new":0},""" +
        s""""wiki":"enwiki","server_name":"en.wikipedia.org",""" +
        s""""log_type":"move","log_action":"move","log_params":$lp,""" +
        s""""meta":{"dt":"2024-01-01T00:00:30Z"}}"""
    val mv = graft.sources.EventAdapter.decodeWire(Seq(
        moveWire("""{"target":"Bar"}"""),
        moveWire("""["Bar"]""")).toDF("value"))
      .select(graft.functions.Classifiers.logParamsTarget(col("logParams")))
      .as[String].collect()
    assert(mv.toSet == Set("Bar", null),
      "map-form move carries its target; array-form yields null (JS undefined)")
  }

  test("streaming: move log event through pageStates does not inflate counts") {
    val events = Seq(
      rc(title = "Foo", at = t0),
      RecentChange("Foo", "moved", 0, "Admin", false, "log", 0L, 0L,
        "enwiki", "en.wikipedia.org", "move", "move",
        LogParams.ofMap(Map("target" -> "Bar")), null, ts("2024-01-01 00:01:00")))
    val snap = TrendStream.replayToSnapshot(spark, events,
      queryName = "trend_log_noise").map(s => s.id -> s).toMap
    // The raw streaming operator ignores the move (rename resolution is
    // upstream); the edit count must stay 1 and no zero-edit page appears.
    assert(snap("Foo").edits == 1 && snap("Foo").updated == t0)
    assert(snap.size == 1)
  }
}
