package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{PageState, RecentChange, TrendConfig}

/** Streaming form of the engine core (reference: the whole of
  * `WikiSocketCollection`, index.js:102-401): a typed
  * `flatMapGroupsWithState` over events keyed by page id, with the
  * reference's update rules (A1-A3, index.js:174-273), same-key log ops
  * (protect A5 index.js:417-422, delete A6 index.js:328-337) and the
  * cleaner's eviction policy (A7, index.js:362-392) re-expressed as a
  * processing-time timeout.
  *
  * Scale design: state lives in Spark's per-key state store (RocksDB/HDFS
  * backed on a cluster), partitioned by the groupByKey exchange on id —
  * the exact analog of the reference's single-process `titles` hash map,
  * horizontally sharded. Checkpointing replaces the LevelDB write-behind
  * cache (S2/S3): exactly-once instead of 20-second lossy snapshots.
  *
  * Rename (A4, cross-key state migration) is handled UPSTREAM of the keyed
  * operator by canonicalizing ids per micro-batch (PageAggregates
  * .canonicalizeRenames) — `flatMapGroupsWithState` cannot move state
  * between keys (SURVEY §7.4 item 1). Cross-batch renames of *existing*
  * state are the streaming limitation; the batch pipeline resolves full
  * rename chains exactly.
  */
object TrendStream {

  /** Classification results the update function needs, precomputed as
    * columns (so the hot path stays codegen'd) and carried per event.
    */
  final case class ClassifiedEvent(
      id: String, title: String, wiki: String, user: String,
      isBot: Boolean, isRevert: Boolean, isAnon: Boolean,
      isNew: Boolean, notab: Long, volat: Long, delta: Long,
      logAction: String, // null | 'protect' | 'delete' (move pre-resolved)
      ts: Timestamp)

  /** Pure per-key update logic — the reference's `updateFromRCStream`
    * (index.js:174-273) plus protect/delete dispatch (index.js:320-337).
    * Order-sensitivity: events are applied in `ts` order within the batch
    * (the reference applies them in arrival order).
    */
  def applyEvents(state: PageState, events: Seq[ClassifiedEvent]): Option[PageState] = {
    var s = state
    var dropped = false
    events.sortBy(_.ts.getTime).foreach { e =>
      e.logAction match {
        case "delete" =>
          // A6: drop state for the page (index.js:427-430).
          dropped = true
        case "protect" =>
          // A5 (index.js:417-422). NOTE known-faithful-bug: the reference
          // builds the id as wiki+'/'+title unconditionally there, so the
          // flag never lands for enwiki (bare-title keys). We replicate
          // the *intended* same-key semantics; the quirk is documented.
          if (!dropped) s = s.copy(isProtected = true, updated = e.ts)
        case _ =>
          if (dropped) { s = PageState.empty(e.id, e.title, e.wiki, e.ts); dropped = false }
          val afterCounts =
            if (e.isRevert)
              s.copy(reverts = s.reverts + 1, bytesChanged = s.bytesChanged + e.delta)
            else if (!e.isBot)
              s.copy(edits = s.edits + 1, bytesChanged = s.bytesChanged + e.delta)
            else s
          var n = afterCounts.copy(
            isNew = s.isNew || e.isNew,
            notabilityFlags = s.notabilityFlags + e.notab,
            volatileFlags = s.volatileFlags + e.volat,
            updated = e.ts)
          if (!e.isBot && !e.isRevert) {
            val dist = n.distribution.updated(e.user, n.distribution.getOrElse(e.user, 0L) + 1L)
            n =
              if (e.isAnon)
                n.copy(anonEdits = n.anonEdits + 1,
                  anons = if (n.anons.contains(e.user)) n.anons else n.anons :+ e.user,
                  distribution = dist)
              else
                n.copy(
                  contributors =
                    if (n.contributors.contains(e.user)) n.contributors
                    else n.contributors :+ e.user,
                  distribution = dist)
          }
          s = n
      }
    }
    if (dropped) None else Some(s)
  }

  /** A7 — the cleaner's keep/drop decision (index.js:370-392), identical
    * policy to the batch `survivors` filter. `asOfMs` is the cleaner tick's
    * processing time.
    */
  def survives(s: PageState, asOfMs: Long, cfg: TrendConfig): Boolean = {
    val ageMins = (asOfMs - s.start.getTime) / 60000.0
    val idleMins = (asOfMs - s.updated.getTime) / 60000.0
    val cnt = s.edits + s.reverts + s.anonEdits // epm(includeReverts, includeAnons)
    val speed = if (ageMins < 1.0 || cnt == 0L) cnt.toDouble else cnt / ageMins
    ageMins <= cfg.minPurgeTimeMins ||
      (ageMins <= cfg.maxLifespanMins &&
        (s.safe || (speed >= cfg.minSpeed && idleMins <= cfg.maxInactivityMins)))
  }

  /** The stateful update function for `flatMapGroupsWithState`.
    * `armTimers=false` runs without the cleaner (used by finite replays —
    * with processing-time timers armed the micro-batch engine keeps
    * scheduling batches to service them and a drain-and-stop trigger never
    * terminates).
    */
  def updateFn(cfg: TrendConfig, armTimers: Boolean)(
      id: String, events: Iterator[ClassifiedEvent],
      state: GroupState[PageState]): Iterator[PageState] = {
    val nowMs = state.getCurrentProcessingTimeMs()
    if (state.hasTimedOut) {
      // Cleaner tick: re-evaluate the full policy, not just idleness
      // (SURVEY §7.4 item 6); survivors re-arm the 20 s timer.
      state.getOption match {
        case Some(s) if survives(s, nowMs, cfg) =>
          state.setTimeoutDuration(cfg.cleanerIntervalSec * 1000)
          Iterator.empty
        case _ =>
          state.remove(); Iterator.empty
      }
    } else {
      val evs = events.toSeq
      val first = evs.minBy(_.ts.getTime)
      val init = state.getOption.getOrElse(
        PageState.empty(first.id, first.title, first.wiki, first.ts))
      applyEvents(init, evs) match {
        case Some(next) =>
          state.update(next)
          if (armTimers) state.setTimeoutDuration(cfg.cleanerIntervalSec * 1000)
          Iterator.single(next)
        case None =>
          if (state.exists) state.remove()
          Iterator.empty
      }
    }
  }

  /** Classify a RecentChange-schema stream into ClassifiedEvents
    * (the streaming twin of PageAggregates.classified).
    */
  def classify(events: Dataset[RecentChange], cfg: TrendConfig): Dataset[ClassifiedEvent] = {
    import graft.functions.Classifiers._
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .filter(isArticle(col("namespace")))
      .filter(projectMatch(col("serverName"), cfg.project))
      .filter(!isFixup(col("comment")))
      .select(
        pageId(col("wiki"), col("title")).as("id"),
        col("title"),
        wikiOf(col("wiki")).as("wiki"),
        coalesce(col("user"), lit("")).as("user"),
        isBotEdit(col("bot"), col("user"), cfg.knownBots).as("isBot"),
        isRevert(col("comment")).as("isRevert"),
        isIP(col("user")).as("isAnon"),
        coalesce(col("rcType") === "new", lit(false)).as("isNew"),
        notabilityHit(col("comment")).as("notab"),
        volatilityHit(col("comment")).as("volat"),
        when(col("logType").isNotNull, lit(0L))
          .otherwise(bytesDelta(col("lengthNew"), col("lengthOld"))).as("delta"),
        when(col("logType").isNotNull, col("logAction"))
          .otherwise(lit(null).cast("string")).as("logAction"),
        col("ts"))
      .as[ClassifiedEvent]
  }

  /** Build the full streaming pipeline: classify → keyed stateful update.
    * Output (Update mode): the refreshed PageState rows per micro-batch —
    * the streaming twin of the reference's `emit('edit', page)` (S4).
    */
  def pageStates(events: Dataset[RecentChange],
      cfg: TrendConfig = TrendConfig(),
      evict: Boolean = true): Dataset[PageState] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (evict) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    classify(events, cfg)
      .groupByKey(_.id)
      .flatMapGroupsWithState[PageState, PageState](
        OutputMode.Update, timeout)(updateFn(cfg, armTimers = evict))
  }

  /** Convenience: run a finite replay of events through the streaming
    * pipeline into an in-memory table and return the final state snapshot —
    * used by tests to prove stream ≡ batch (SURVEY §5.2 item 2).
    */
  def replayToSnapshot(spark: SparkSession, events: Seq[RecentChange],
      cfg: TrendConfig = TrendConfig(), queryName: String = "trend_replay"): Seq[PageState] = {
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RecentChange](spark)
    ms.addData(events)
    // evict=false (NoTimeout) + AvailableNow: drain what's queued then
    // terminate. With processing-time timers armed the engine would keep
    // scheduling micro-batches to service them and never settle; the
    // eviction policy is exercised directly via survives().
    val q = pageStates(ms.toDS(), cfg, evict = false).writeStream
      .format("memory").queryName(queryName).outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    // Update-mode memory sink appends each update; keep the LAST row per id.
    spark.table(queryName).as[PageState].collect()
      .groupBy(_.id).map { case (_, rows) => rows.last }.toSeq
  }
}
