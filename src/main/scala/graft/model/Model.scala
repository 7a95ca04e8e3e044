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
    logParams: LogParams,       // wire-variant value (map | array | string)
    logActionComment: String,   // regex-parsed for deletes (index.js:330)
    ts: Timestamp)              // event/processing time

/** The `log_params` wire value. On the real feed it arrives in THREE
  * shapes depending on the log action's formatter vintage — a modern
  * object (`{"target": "New title", ...}`), a legacy positional ARRAY
  * (`["0", "1"]`), or a bare STRING — and the reference consumes all
  * three through duck-typed JS (`params.target` at index.js:324,
  * `!params.length` at index.js:329). A flat `MapType` decode — this
  * model's previous shape — NULLed the array/string forms, so a
  * legacy-array delete read as "params empty" and fired the A6 drop the
  * reference gates out.
  *
  * Exactly one field is non-null (all three null = the message carried
  * no `log_params` / an explicit JSON null). Which field is populated is
  * decided by the PARSER from the JSON token type
  * ([[graft.sources.EventAdapter.decodeWire]]), never by sniffing text —
  * a string value that happens to look like `"[]"` stays a string.
  * Dispatch semantics over the variant live in
  * [[graft.functions.Classifiers.logParamsTarget]] and
  * [[graft.functions.Classifiers.logParamsGateOpen]].
  */
final case class LogParams(
    map: Map[String, String],   // object form
    arr: Seq[String],           // array form (non-string elements raw-captured)
    str: String)                // string form

object LogParams {
  def ofMap(m: Map[String, String]): LogParams = LogParams(m, null, null)
  def ofArr(a: Seq[String]): LogParams = LogParams(null, a, null)
  def ofStr(s: String): LogParams = LogParams(null, null, s)
  /** Spark DDL of the variant struct — for null-literal casts. */
  val ddl: String = "struct<map:map<string,string>,arr:array<string>,str:string>"
}

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
    // RAW capture: Jackson serializes a non-string value (object/array)
    // back to its JSON text under a StringType target (measured on
    // 4.1.2), so no wire form is lost here. decodeWire then builds the
    // typed LogParams variant from per-form parses of the message —
    // the token TYPE, not the text, decides the form.
    StructField("log_params", StringType),
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
