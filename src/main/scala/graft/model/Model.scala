package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Input event record — the fields of a Wikimedia `recentchange` event the
  * engine consumes (reference: consumed fields at index.js:241-268,311-337;
  * fixture shape at test/tests.js:4-26). Fixed, declared schema (the
  * reference duck-types a dynamic JS object).
  *
  * `rcType` carries the reference's `type` field (`'new'` / `'edit'` /
  * `'log'`) — `type` is a Scala keyword.
  */
final case class RecentChange(
    title: String,
    comment: String,
    namespace: Int,
    user: String,
    bot: Boolean,
    rcType: String,
    lengthOld: Long,
    lengthNew: Long,
    wiki: String,
    serverName: String,
    logType: String,            // null for plain edits
    logAction: String,          // 'move' | 'protect' | 'delete' | null
    logParams: Map[String, String], // reference: log_params.target for moves
    logActionComment: String,   // regex-parsed for deletes (index.js:330)
    ts: Timestamp)              // event/processing time

object RecentChange {
  // (No companion flat "schema" here on purpose: the only schema raw SSE
  // payloads decode with is wireSchema below — a flat camelCase schema
  // would from_json a real wire message to all-null rows, and as a
  // hand-synced copy of the case-class field list it verified nothing.
  // Derive Encoders.product[RecentChange].schema if a flat form is ever
  // needed.)

  /** Schema matching the wire shape of a Wikimedia recentchange JSON
    * message (`length.old`/`length.new` nested struct, snake_case names) —
    * used by `from_json` when decoding a raw feed (index.js:313).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("comment", StringType),
    StructField("namespace", IntegerType),
    StructField("user", StringType),
    StructField("bot", BooleanType),
    StructField("type", StringType),
    StructField("length", StructType(Seq(
      StructField("old", LongType), StructField("new", LongType)))),
    StructField("wiki", StringType),
    StructField("server_name", StringType),
    StructField("log_type", StringType),
    StructField("log_action", StringType),
    StructField("log_params", MapType(StringType, StringType)),
    StructField("log_action_comment", StringType),
    StructField("meta", StructType(Seq(StructField("dt", StringType))))))
}

/** Per-page accumulated trend statistics — the keyed state record
  * (reference: `WikiPage`, ctor index.js:16-50, schema table SURVEY §1.2).
  * Static schema; the reference grows fields dynamically (index.js:410,
  * 420,444-445) — here every field always exists with a default.
  */
final case class PageState(
    id: String,                 // wiki + '/' + title; bare title for enwiki (index.js:438-441)
    title: String,
    wiki: String,               // '' for enwiki
    edits: Long,                // non-bot, non-revert edits (anon included) — index.js:256-261
    anonEdits: Long,            // additionally counted for anon users (index.js:198)
    isNew: Boolean,             // any event with type='new' (index.js:247-249)
    notabilityFlags: Long,      // comment-keyword counter (index.js:221-227)
    volatileFlags: Long,        // deletion/vandalism-keyword counter (index.js:229-238)
    reverts: Long,              // never counted as edits (index.js:251-253)
    start: Timestamp,           // first-seen (index.js:29)
    updated: Timestamp,         // last-event (index.js:270)
    contributors: Seq[String],  // distinct named non-anon/bot/revert editors (index.js:206-211)
    anons: Seq[String],         // distinct IP editors (index.js:199-204)
    distribution: Map[String, Long], // per-editor edit counts (index.js:201-210)
    bytesChanged: Long,         // Σ(length.new − length.old) per policy index.js:251-261
    safe: Boolean,              // eviction exemption (index.js:409-411)
    isProtected: Boolean)       // set by 'protect' log events (index.js:417-422)

object PageState {
  /** Empty state for a newly-seen page (reference ctor index.js:16-35). */
  def empty(id: String, title: String, wiki: String, now: Timestamp): PageState =
    PageState(id, title, wiki, 0L, 0L, isNew = false, 0L, 0L, 0L,
      start = now, updated = now, Nil, Nil, Map.empty, 0L,
      safe = false, isProtected = false)
}

/** Engine configuration — defaults mirror the reference
  * (index.js:110-113,143). All durations in minutes except
  * cleanerIntervalSec (the 20 s sweep cadence, index.js:400).
  */
final case class TrendConfig(
    project: String = "en.wikipedia.org", // server_name filter; '*' = all
                                     // (reference default, index.js:143)
    maxLifespanMins: Long = 1440,    // drop unconditionally past this age (index.js:110)
    maxInactivityMins: Long = 60,    // drop when idle this long (index.js:111)
    minSpeed: Double = 3.0,          // edits/minute floor (index.js:112)
    minPurgeTimeMins: Long = 5,      // grace period before policy applies (index.js:113)
    cleanerIntervalSec: Long = 20,   // eviction re-check cadence (index.js:400)
    knownBots: Seq[String] = Seq("ClueBot NG")) // hard-coded allowlist (index.js:281)
