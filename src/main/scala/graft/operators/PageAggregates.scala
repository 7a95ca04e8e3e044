package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Classifiers._
import graft.model.TrendConfig

/** Batch form of the engine core: the reference's keyed stateful upsert
  * aggregation (A1-A3, index.js:174-273) re-expressed as declarative
  * `groupBy(id).agg(...)` column algebra (SURVEY §2.3).
  *
  * The stateful update is order-insensitive for every counter (conditional
  * sums, distinct sets, per-editor map, min(start), max(updated), any(new)),
  * so this batch aggregation is semantically identical to replaying the
  * stream through the stateful operator — that identity is the engine's
  * central correctness property and is what the DuckDB oracle verifies.
  *
  * Scale notes (100 TB): a single hash aggregation with map-side partial
  * combine; the only shuffle is the exchange on `id`. `collect_set` of
  * editors is the one per-key unbounded structure — at the 100 TB tier use
  * `contributorCardinalities` (HLL `approx_count_distinct`) instead of the
  * exact sets, and the two-level `distribution` pre-aggregation already
  * bounds the map fan-in by (id,user) before the per-id merge.
  */
object PageAggregates {

  /** The reference's PRE-DISPATCH gate (index.js:316-318): main
    * namespace, project match, not a fixup — applied to EVERY message,
    * edit AND log event (move/protect/delete), before any routing. A
    * gated-out move must not rewrite page history and a gated-out delete
    * must not drop state, exactly as the reference's onmessage returns
    * before reaching the log dispatch. Comment is null-coalesced inside
    * the predicate (a null comment flows through isFixup as NULL and
    * would silently drop the row).
    */
  def referenceGate(events: DataFrame,
      cfg: TrendConfig = TrendConfig()): DataFrame =
    events
      .filter(isArticle(col("namespace")))                   // F1 index.js:316
      .filter(projectMatch(col("serverName"), cfg.project))  // F2 index.js:317
      // isFixup owns the null guard internally (one kernel, one
      // contract) — no call-site coalesce.
      .filter(!isFixup(col("comment")))                      // F3 index.js:318

  /** Filter + classify layer (F1-F3 filters, C1-C5/P1 projections).
    * Input: a DataFrame with the RecentChange schema (graft.model).
    * All predicates are scan-pushable `Column` exprs; no UDFs.
    * Reference flow: index.js:316-318 (filters), 241-244 (classify).
    */
  def classified(events: DataFrame, cfg: TrendConfig = TrendConfig()): DataFrame =
    referenceGate(events, cfg)
      // Null-safe classifier inputs, SAME normalization as
      // TrendStream.classify: a rev-deleted/suppressed editor arrives
      // with user = null and a null comment flows through isRevert /
      // isFixup — un-guarded, the batch boards would silently drop (or
      // zero-route) events the streaming subscription counts, breaking
      // the stream ≡ batch identity on real feeds.
      .withColumn("user", coalesce(col("user"), lit("")))
      .withColumn("comment", coalesce(col("comment"), lit("")))
      .withColumn("isBot", isBotEdit(col("bot"), col("user"), cfg.knownBots))
      .withColumn("isRevert", isRevert(col("comment")))
      .withColumn("isAnon", isIP(col("user")))
      .withColumn("delta", bytesDelta(col("lengthNew"), col("lengthOld")))
      .withColumn("notab", notabilityHit(col("comment")))
      .withColumn("volat", volatilityHit(col("comment")))
      .withColumn("id", pageId(col("wiki"), col("title")))
      .withColumn("wikiNorm", wikiOf(col("wiki")))

  /** A1+A2 — the per-page aggregate over classified edit events.
    * Update-rule fidelity (index.js:246-270):
    *   - type='new'  → isNew                     (247-249)
    *   - revert      → reverts++, delta applies EVEN for bots (251-255)
    *   - !revert & !bot → edits++, delta applies (256-262); anon also
    *     increments anonEdits (198)
    *   - comment keyword counters always accumulate (264)
    *   - editor stats (contributors/anons) only when !bot & !revert (266-268)
    * Log events (logType TRUTHY — `isLogEvent`, index.js:320) are routed
    * elsewhere (index.js:320-337) and must be excluded before aggregation;
    * a `log_type=""` event is FALSY there and counts as a plain edit.
    * Null-ts edit rows are dropped to preserve the stream ≡ batch
    * identity: the fgws classify (and every streaming operator, round-9
    * rule) drops them because its stateful replay orders by ts, so the
    * batch aggregation counting them would split the engine's central
    * identity on one malformed feed row.
    */
  def pageAggregates(events: DataFrame, cfg: TrendConfig = TrendConfig()): DataFrame = {
    val e = classified(events, cfg)
      .filter(!isLogEvent(col("logType")) && col("ts").isNotNull)
    val counts = col("isRevert") || !col("isBot") // delta policy index.js:251-261
    val isEdit = !col("isRevert") && !col("isBot")
    e.groupBy(col("id"))
      .agg(
        // max() not last(): per-id title/wiki are functions of the id (the
        // rename flow canonicalizes ids BEFORE this agg), and max is
        // deterministic under shuffles where last/first are not.
        max(col("title")).as("title"),
        max(col("wikiNorm")).as("wiki"),
        sum(when(isEdit, 1L).otherwise(0L)).as("edits"),
        sum(when(isEdit && col("isAnon"), 1L).otherwise(0L)).as("anonEdits"),
        max(coalesce(col("rcType") === "new", lit(false))).as("isNew"),
        sum(col("notab")).as("notabilityFlags"),
        sum(col("volat")).as("volatileFlags"),
        sum(when(col("isRevert"), 1L).otherwise(0L)).as("reverts"),
        min(col("ts")).as("start"),
        max(col("ts")).as("updated"),
        array_sort(collect_set(when(isEdit && !col("isAnon"), col("user"))))
          .as("contributors"),
        array_sort(collect_set(when(isEdit && col("isAnon"), col("user"))))
          .as("anons"),
        sum(when(counts, col("delta")).otherwise(0L)).as("bytesChanged"))
  }

  /** A3 — the per-editor `distribution` map (index.js:201-210), as a
    * two-level aggregation: pre-aggregate by (id, user) first so the
    * per-id merge sees one entry per editor, not one per event — this is
    * the shuffle-lean form at scale (SURVEY §7.3).
    */
  def distribution(events: DataFrame, cfg: TrendConfig = TrendConfig()): DataFrame =
    distributionPairs(events, cfg)
      .groupBy(col("id"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("user"), col("cnt")))))
        .as("distribution"))

  /** The first level of the distribution aggregation — one row per
    * (page, editor) with the edit count. Queries that want rows (not the
    * map) should read THIS level directly: building the map and exploding
    * it back pays a collect_list + map_from_entries + explode round-trip
    * for output the level-1 agg already has.
    */
  def distributionPairs(events: DataFrame,
      cfg: TrendConfig = TrendConfig()): DataFrame = {
    // Same edit-path gate as pageAggregates: falsy log dispatch
    // (isLogEvent) + the null-ts drop that keeps stream ≡ batch.
    val e = classified(events, cfg)
      .filter(!isLogEvent(col("logType")) && col("ts").isNotNull)
    e.filter(!col("isBot") && !col("isRevert"))
      .groupBy(col("id"), col("user")).agg(count(lit(1)).as("cnt"))
  }

  /** Scalable stand-in for exact contributor sets at the 100 TB tier:
    * HLL cardinalities instead of materialized arrays (SURVEY §2.2 aggs).
    */
  def contributorCardinalities(events: DataFrame,
      cfg: TrendConfig = TrendConfig()): DataFrame = {
    val e = classified(events, cfg)
      .filter(!isLogEvent(col("logType")) && col("ts").isNotNull)
    val isEdit = !col("isRevert") && !col("isBot")
    e.groupBy(col("id")).agg(
      approx_count_distinct(when(isEdit && !col("isAnon"), col("user")))
        .as("approxContributors"),
      approx_count_distinct(when(isEdit && col("isAnon"), col("user")))
        .as("approxAnons"))
  }

  // ---- derived metrics (M1-M4) -----------------------------------------
  // The reference computes these with wall-clock `new Date()`
  // (index.js:65,73); for batch determinism every metric takes an explicit
  // `asOf` column (SURVEY §7.4 item 3).

  /** M1 — minutes since first event (reference `age()`, index.js:64-67). */
  def age(start: Column, asOf: Column): Column =
    (asOf.cast("double") - start.cast("double")) / 60.0

  /** M2 — minutes since last event (reference `lastUpdated()`, index.js:72-75). */
  def lastUpdated(updated: Column, asOf: Column): Column =
    (asOf.cast("double") - updated.cast("double")) / 60.0

  /** M3 — edits per minute (index.js:80-88). Returns the raw count when
    * age < 1 minute or count = 0, else count/age. With includeAnons the
    * anon edits are counted AGAIN on top of `edits` (they are already in
    * it) — faithful double-weighting (SURVEY §7.4 item 4).
    */
  def editsPerMinute(edits: Column, reverts: Column, anonEdits: Column,
      ageMins: Column, includeReverts: Boolean = false,
      includeAnons: Boolean = false): Column = {
    var cnt = edits
    if (includeReverts) cnt = cnt + reverts
    if (includeAnons) cnt = cnt + anonEdits
    when(ageMins < 1.0 || cnt === 0L, cnt.cast("double"))
      .otherwise(cnt.cast("double") / ageMins)
  }

  /** M4 — author-concentration bias in [0,1]; 1.0 = single-author page.
    * The reference delegates to the unvendored `wikipedia-edits-scorer`
    * package (index.js:57-59); our pinned spec (SURVEY §7.4 item 5) is
    * max-share of the per-editor distribution map. Pure expression — no UDF.
    */
  def bias(distribution: Column): Column = {
    val vals = map_values(distribution)
    val total = aggregate(vals, lit(0L), (acc, x) => acc + x)
    when(size(vals) === 0, lit(0.0))
      .otherwise(array_max(vals).cast("double") / total.cast("double"))
  }

  /** Project the full metric set onto an aggregated page DataFrame. */
  def withMetrics(pages: DataFrame, asOf: Column): DataFrame = {
    val a = age(col("start"), asOf)
    pages
      .withColumn("age", a)
      .withColumn("lastUpdated", lastUpdated(col("updated"), asOf))
      .withColumn("editsPerMinute",
        editsPerMinute(col("edits"), col("reverts"), col("anonEdits"), a))
  }

  /** A7 batch analog — the cleaner's eviction policy as a filter
    * (index.js:362-392): keep a page when
    *   age <= minPurgeTime, OR (safe AND age <= maxLifespan), OR
    *   (speed >= minSpeed AND idle <= maxInactivity AND age <= maxLifespan).
    * `safe` pages are still dropped past maxLifespan (index.js:379-389).
    */
  def survivors(pages: DataFrame, asOf: Column,
      cfg: TrendConfig = TrendConfig()): DataFrame = {
    val ageC = age(col("start"), asOf)
    val idle = lastUpdated(col("updated"), asOf)
    // No-arg editsPerMinute(), as the reference cleaner calls it
    // (index.js:374): edits only — no reverts, no anon double-count.
    val speed = editsPerMinute(col("edits"), col("reverts"), col("anonEdits"),
      ageC)
    val safeC = if (pages.columns.contains("safe")) col("safe") else lit(false)
    pages.filter(
      ageC <= cfg.minPurgeTimeMins ||
      (ageC <= cfg.maxLifespanMins &&
        (safeC || (speed >= cfg.minSpeed && idle <= cfg.maxInactivityMins))))
  }

  /** Q3 — top-k board by a metric column. Plans as TakeOrderedAndProject
    * (no full sort, no full shuffle — each partition keeps k, driver merges).
    */
  def topK(pages: DataFrame, metric: String, k: Int): DataFrame =
    // NULLS LAST on the tie-break: Spark's bare asc sorts NULL first,
    // so the deliberately-retained null-id page would win a k-boundary
    // metric tie and displace a real page — and diverge from the
    // oracle's ORDER BY id (DuckDB ASC defaults NULLS LAST). The
    // packAssignments/clusterPurity ordering class.
    pages.orderBy(desc(metric), asc_nulls_last("id")).limit(k)

  /** A4 batch analog — resolve rename (move-log) chains so events
    * aggregate under the page's FINAL title. Builds the per-wiki
    * (fromTitle → toTitle) map from move events (index.js:324-325:
    * log_params.target is the new title), collapses chains a→b→c to a→c on
    * the driver, then rewrites `title` via a broadcast join; `pageId`
    * downstream then yields the canonical id.
    *
    * Scale: the rename log is O(pages-renamed) — administrative events,
    * orders of magnitude smaller than the edit stream — so driver-side
    * chain collapse + broadcast holds at any contemplated scale; the big
    * side is never shuffled.
    *
    * Note (SURVEY §7.4 item 1): the streaming path replicates the
    * reference's overwrite-not-merge rename exactly; this batch form merges
    * all history under the final title, the documented order-insensitive
    * analog.
    */
  def canonicalizeRenames(events: DataFrame,
      cfg: TrendConfig = TrendConfig()): DataFrame = {
    // Moves pass the reference's pre-dispatch gate first (index.js:316-318
    // precedes the move dispatch at 324): a fixup-comment, wrong-project
    // or non-main-namespace move never rewrites history.
    // The wiki key is NORMALIZED (wikiOf: null/''/'enwiki' all → '') on
    // both the move side and the event join below — the falsy contract
    // pageId enforces. A raw-equality join would let a move recorded
    // under wiki='enwiki' miss an edit arriving with wiki=null for the
    // SAME page (null-false join), splitting one page's history across
    // two ids — and diverging from IncrementalTrend's id-keyed rename
    // join, which goes through pageId.
    val moves = referenceGate(events, cfg)
      .filter(isLogEvent(col("logType")) && col("logAction") === "move")
      // Null-ts moves cannot be SEQUENCED and are dropped — the
      // IncrementalTrend rule (its gatedLog filters ts.isNotNull for
      // exactly this reason): sorted NULLS FIRST they would otherwise
      // count as the EARLIEST move in the chain collapse, and the batch
      // and incremental rename paths would resolve the same feed to
      // different page ids. No trend oracle carries a move-side
      // `ts IS NOT NULL` mirror because none CAN: the EventAdapter
      // mapping emits logType = NULL for every row, so log events are
      // unexpressible in the oracle restatement — a testdata regen that
      // introduces real log events must extend the adapter mapping AND
      // model the move chain in the oracles in the same change.
      .filter(col("ts").isNotNull)
      .select(wikiOf(col("wiki")).as("wiki"), col("title").as("fromTitle"),
        logParamsTarget(col("logParams")).as("toTitle"), col("ts"))
      // A malformed move with no target would resolve its upstream movers
      // to null (the sweep follows edges through it) — one bad admin
      // event must not split a page's history across two ids.
      .filter(col("toTitle").isNotNull)
    // Tie-break beyond ts: equal-timestamp moves (second-granularity
    // feed, move sprees) otherwise collect in ARBITRARY order and the
    // chain resolution — order-sensitive by design — flips between runs.
    // limit-before-collect (the heavyTokens/IncrementalTrend discipline):
    // the warn used to run only AFTER the unbounded collect had already
    // materialized a move-flood on the driver — the guard must precede
    // the hazard it guards, so the collect is bounded and a flood past
    // MaxLogOps fails loudly instead of OOMing.
    val edges = moves
      .orderBy(col("ts"), col("wiki"), col("fromTitle"), col("toTitle"))
      .select("wiki", "fromTitle", "toTitle")
      .limit(MaxLogOps + 1).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2)))
    require(edges.length <= MaxLogOps,
      s"move log exceeds $MaxLogOps events — the driver-side chain " +
        "collapse cannot hold it; pre-filter the event range")
    warnIfMoveFlood(edges.length)
    // Sequential-replay semantics (a later C→A targets the now-vacant A,
    // never A's earlier destination): each from-key's final mapping follows
    // its LAST outgoing move, then each arrival node's next-in-time move.
    // One reverse-chronological sweep computes that in O(m): fdArrive(n) =
    // where mass arriving at n (before the edges still to be scanned) ends.
    // Replaces the per-edge rescan of all resolved keys — O(m²) on the
    // driver, a real stall under a move-flood (vandalism spree).
    val fdArrive = scala.collection.mutable.HashMap[(String, String), String]()
    val resolvedFinal = scala.collection.mutable.HashMap[(String, String), String]()
    edges.reverseIterator.foreach { case ((wiki, from), to) =>
      val dest = fdArrive.getOrElse((wiki, to), to)
      if (!resolvedFinal.contains((wiki, from))) resolvedFinal((wiki, from)) = dest
      fdArrive((wiki, from)) = dest
    }
    val spark = events.sparkSession
    import spark.implicits._
    val renameMap = resolvedFinal.toSeq.map { case ((w, f), t) => (w, f, t) }
      .toDF("r_wiki", "r_from", "r_to")
    events
      .join(broadcast(renameMap),
        wikiOf(col("wiki")) === col("r_wiki") &&
          col("title") === col("r_from"), "left")
      .withColumn("title", coalesce(col("r_to"), col("title")))
      .drop("r_wiki", "r_from", "r_to")
  }

  /** Move logs are administrative-event volumes (orders of magnitude below
    * the edit stream), so a driver-side collect + broadcast is the right
    * plan — but guard it: past this cap the log is likely a move-flood and
    * the broadcast itself becomes the hazard.
    */
  // Must sit BELOW MaxLogOps: the warn is the early tier of a two-tier
  // guard (warn at 64k that the driver-side structures are growing, hard
  // require at 512k). The original 1<<20 value was unreachable once the
  // hard cap landed at 1<<19 — a warn that can never fire is dead code.
  val MoveLogWarnThreshold: Int = 1 << 16

  /** Hard limit-before-collect bound on driver-side log-op collects —
    * shared by the batch chain collapse here and the incremental fold's
    * sequential replay (IncrementalTrend), so the two paths fail at the
    * same scale instead of one warning and one OOMing.
    */
  val MaxLogOps: Int = 1 << 19

  private[graft] def warnIfMoveFlood(n: Int): Unit =
    if (n > MoveLogWarnThreshold)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"rename log has $n moves (> $MoveLogWarnThreshold): " +
          "likely a move-flood; driver collect + broadcast may stall")

  /** Full trend pipeline: canonicalize renames, then aggregate per page. */
  def trendAggregates(events: DataFrame, cfg: TrendConfig = TrendConfig()): DataFrame =
    pageAggregates(canonicalizeRenames(events, cfg), cfg)
}
