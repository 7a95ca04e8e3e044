package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.TrendConfig

/** Pure-`Column` classifiers and projections — the filter/classify layer of
  * the engine (reference: F1-F3, C1-C5, P1 in SURVEY §2.1). Zero UDFs: every
  * predicate is a built-in expression so it stays inside whole-stage codegen
  * and pushes down to the scan where possible.
  *
  * Semantics are pinned to the reference, including its documented oddities
  * (SURVEY §7.4): the loose IP regex, revert-keyword subsumption, and the
  * dead capital-D `'→Death'` notability branch.
  */
object Classifiers {

  /** C1 — anonymous-editor classifier (reference `isIP`, index.js:11-14).
    * Matches an IPv4 dotted quad or a 5-group uppercase-hex IPv6 fragment
    * anywhere in the string — deliberately the reference's exact loose
    * regex, kept for parity.
    */
  // coalesce OWNED BY THE KERNEL (the isRevert/isFixup contract): a null
  // user otherwise evaluates to NULL, and a direct caller's !isIP filter
  // would silently drop the row (or a non-nullable Boolean encoder would
  // kill a streaming query on one rev-deleted editor). The existing call
  // sites' pre-coalesce stays — double-coalescing is a no-op.
  def isIP(user: Column): Column =
    coalesce(user, lit(""))
      .rlike("([0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+|[0-9A-F]+:[0-9A-F]+:[0-9A-F]+:[0-9A-F]+:[0-9A-F]+)")

  /** C2 — revert classifier (reference `isRevert`, index.js:179-187).
    * Lower-cases the comment then substring-matches. `"revert"` subsumes
    * `"reverting"`/`"reverted"`; all three kept for fidelity.
    */
  val revertKeywords: Seq[String] =
    Seq("tag:", "undid", "revert", "reverting", "reverted", "wp:")

  def isRevert(comment: Column): Column =
    containsAny(lower(coalesce(comment, lit(""))), revertKeywords)

  /** C3 — bot classifier (reference `isBotEdit`, index.js:280-284):
    * the event's `bot` flag OR a hard-coded username allowlist.
    */
  def isBotEdit(bot: Column, user: Column,
      knownBots: Seq[String] = TrendConfig().knownBots): Column =
    // user coalesced like isIP (the kernel-owns-the-null-guard rule):
    // false || NULL is NULL, not false.
    coalesce(bot, lit(false)) || coalesce(user, lit("")).isin(knownBots: _*)

  /** C4 — notability flag per comment: 0/1, incremented ONCE per event when
    * ANY keyword matches (the reference ORs the keywords then does a single
    * `notabilityFlags++`, index.js:218-227). The comment is lower-cased
    * first (index.js:219), so the capital-D `'→Death'` branch
    * (index.js:223) can never match — replicated as-is
    * (known-faithful-bug, SURVEY §2.1 C4).
    */
  val notabilityKeywords: Seq[String] =
    Seq("eventtag", "current event", "→Death", "ongoing event")

  def notabilityHit(comment: Column): Column =
    anyHit(comment, notabilityKeywords)

  /** C5 — volatility/vandalism flag per comment: 0/1 when any keyword
    * matches (single `volatileFlags++` behind an OR, index.js:229-238).
    */
  val volatilityKeywords: Seq[String] = Seq(
    "speedy deletion", "nominated for deletion",
    "nominated page for deletion", "restore afd template",
    "{{pp-vandalism", "proposing article for deletion")

  def volatilityHit(comment: Column): Column =
    anyHit(comment, volatilityKeywords)

  /** F3 — fixup filter (reference `isFixup`, index.js:291-293):
    * comment contains `'Fixed error'`, case-SENSITIVE (no lower-casing in
    * the reference here).
    */
  def isFixup(comment: Column): Column =
    coalesce(comment, lit("")).contains("Fixed error")

  /** F1 — namespace filter: keep article-namespace events (index.js:316). */
  def isArticle(namespace: Column): Column = namespace === 0

  /** F2 — project filter (index.js:317): wildcard or exact server match. */
  def projectMatch(serverName: Column, project: String): Column =
    if (project == "*") lit(true) else serverName === project

  /** The reference's log dispatch predicate (`else if (data.log_type)`,
    * index.js:320) — JS TRUTHY, not null-vs-non-null: a `log_type` of `""`
    * is falsy there, so the event falls through to the EDIT branch and is
    * counted as a real edit. isNull/isNotNull routing mis-dispatches that
    * event to the log branch, where a null/absent `log_action` gates it
    * out — the edit silently vanishes from every aggregate. One kernel so
    * the batch aggregation, the fgws classify, and the incremental fold
    * can never drift on the dispatch rule.
    */
  def isLogEvent(logType: Column): Column =
    logType.isNotNull && length(logType) > 0

  /** P1 — bytes-delta projection (index.js:244). */
  def bytesDelta(lengthNew: Column, lengthOld: Column): Column =
    coalesce(lengthNew, lit(0L)) - coalesce(lengthOld, lit(0L))

  /** Page id (reference getPage, index.js:436-449): `wiki + '/' + title`,
    * bare title for `'enwiki'` (index.js:438-441). The reference's
    * `wiki ? wiki+'/'+title : title` is FALSY-based, so a null or empty
    * wiki also falls back to the bare title — without that, a wire event
    * missing the field would null-propagate through concat and every
    * such event would merge into one id=NULL state bucket (and the
    * wikiOf-normalized `''` would not round-trip through the id scheme).
    */
  def pageId(wiki: Column, title: Column): Column =
    when(wiki.isNull || wiki === "" || wiki === "enwiki", title)
      .otherwise(concat(wiki, lit("/"), title))

  /** Driver-side twin of [[pageId]] — THE id scheme's single definition
    * for Scala call sites (point lookups, control ops, state bucketing);
    * a scheme change must not be able to diverge between the column and
    * driver paths.
    */
  def pageIdStr(wiki: String, title: String): String =
    // A null title is NULL on the column side in BOTH arms (bare title,
    // and concat's null propagation) — the string interpolation's
    // "wiki/null" was the one divergence the twin contract forbids: a
    // driver-side lookup with it could never match the column-side
    // NULL-id state.
    if (title == null) null
    else if (wiki == null || wiki.isEmpty || wiki == "enwiki") title
    else s"$wiki/$title"

  /** Normalized wiki column: `''` for enwiki (index.js:445 sets wiki only
    * on the non-enwiki path). Null/'' normalize to `''` too — the SAME
    * falsy contract as [[pageId]]: a wire event missing the field gets
    * the bare-title (enwiki) page id, so its wiki attribute must be the
    * enwiki `''`, not a NULL that would make first(wikiNorm) per page
    * nondeterministic between the two arrival orders.
    */
  def wikiOf(wiki: Column): Column =
    when(wiki.isNull || wiki === "" || wiki === "enwiki", lit(""))
      .otherwise(wiki)

  /** Driver-side twin of [[wikiOf]] — the [[pageIdStr]] discipline: one
    * definition of the falsy normalization for Scala call sites
    * (synthesized state rows), so the column and driver paths cannot
    * diverge.
    */
  def wikiOfStr(wiki: String): String =
    if (wiki == null || wiki.isEmpty || wiki == "enwiki") "" else wiki

  /** The A6 delete-gate kernel, single-sourced for BOTH consumers (the
    * fgws stream's classify and the incremental fold's deleteEvents —
    * two hand-synced copies were the bandKeyArray drift class): the
    * reference takes match group 1 or 2 of the HTML-entity comment
    * pattern (index.js:330-336) as the page to drop, and acts only when
    * the `!params.length` gate is open ([[logParamsGateOpen]]).
    */
  val DeleteCommentPattern: String =
    "&quot;\\[\\[(.*)\\]\\]&quot;|&quot;(.*)&quot;"

  /** The parsed delete-target title (empty string on no match; NULL
    * propagates a NULL comment).
    */
  def deleteTargetTitle(logActionComment: Column): Column = {
    val g1 = regexp_extract(logActionComment, DeleteCommentPattern, 1)
    val g2 = regexp_extract(logActionComment, DeleteCommentPattern, 2)
    when(length(g1) > 0, g1).otherwise(g2)
  }

  /** `params.target` (index.js:324) — the move's new title. Defined only
    * for the map (object) wire form: the reference's property access on
    * an array or string is JS `undefined`, so those forms yield NULL
    * here (and every consumer already drops null-target moves).
    *
    * DELIBERATE DIVERGENCE, spec-pinned (IncrementalTrendSpec's
    * non-map-move fixture): the reference passes that `undefined`
    * straight into `renamePage(title, wiki, params.target)`
    * (index.js:156,440), which MOVES the page onto a junk title keyed
    * `"undefined"` and kills the source — an accident of JS property
    * access, not a semantic. Graft's null-target drop keeps the source
    * page untouched instead.
    */
  def logParamsTarget(logParams: Column): Column =
    element_at(logParams.getField("map"), "target")

  /** The reference's A6 delete gate `!params.length` (index.js:329)
    * under exact JS semantics per wire form ([[graft.model.LogParams]]):
    *   - absent / JSON null → `!undefined` → OPEN
    *   - object form → a JS object has no INTRINSIC `.length`, so the
    *     gate is OPEN for any ordinary map (modern assoc-array params
    *     serialize as objects and never block the delete) — UNLESS the
    *     object carries a literal `"length"` entry, which JS property
    *     access duck-types: `{length: "2"}.length` is `"2"` (truthy →
    *     gate CLOSED), `{length: ""}` is falsy → open. One adversarial
    *     feed row must not diverge this gate from index.js (the
    *     cmd-forgery threat model).
    *   - array form → open iff length 0
    *   - string form → open iff empty (`"".length` is falsy)
    * Not expressible as an "is empty" test — the previous MapType model
    * read every legacy-array delete as droppable and gated non-empty
    * maps the reference lets through. (Numeric/boolean values —
    * a scalar `log_params: 5`, or a map `length` entry holding JSON
    * `0`/`false` — raw-capture as strings, so `"0"` reads truthy where
    * the JS NUMBER 0 is falsy; no log formatter emits those; documented,
    * not defended.)
    */
  def logParamsGateOpen(logParams: Column): Column = {
    val lenEntry = element_at(logParams.getField("map"), "length")
    when(logParams.isNull, lit(true))
      .when(logParams.getField("map").isNotNull,
        lenEntry.isNull || length(lenEntry) === 0)
      .when(logParams.getField("arr").isNotNull,
        size(logParams.getField("arr")) === 0)
      .when(logParams.getField("str").isNotNull,
        length(logParams.getField("str")) === 0)
      .otherwise(lit(true)) // all-null variant = field absent
  }

  // ---- helpers ----------------------------------------------------------

  /** OR-chain of case-insensitive-on-caller substring tests (codegen'd). */
  private def containsAny(lowered: Column, keywords: Seq[String]): Column =
    keywords.map(k => lowered.contains(k)).reduce(_ || _)

  /** 1 when any keyword is present in the lower-cased comment, else 0 —
    * the reference increments the flag counter once per qualifying EVENT
    * (one `++` behind an OR-chain, index.js:221-227,230-237).
    */
  private def anyHit(comment: Column, keywords: Seq[String]): Column =
    when(containsAny(lower(coalesce(comment, lit(""))), keywords), lit(1L))
      .otherwise(lit(0L))
}
