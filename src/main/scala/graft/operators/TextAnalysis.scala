package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Barrier.BarrierOps

/** Text-analysis operators for the `documents` table — the training-data-
  * pipeline surface (BASELINE.json north star): tokenization, quality
  * scoring, language-ID, document fingerprinting. Everything is a pure
  * `Column` expression (whole-stage-codegen'd, no UDFs) and every derived
  * value is re-computable in ANSI SQL so the DuckDB oracle can verify it.
  *
  * Scale: all per-row map-side work — no shuffle at all; the parquet scan
  * prunes to (doc_id, text).
  */
object TextAnalysis {

  /** Whitespace tokens (empty array for blank text). Boundary empties are
    * filtered: Spark's `trim` strips only ASCII spaces and `split` keeps
    * boundary empty strings, so text with a leading/trailing tab or
    * newline would otherwise grow phantom "" tokens that inflate counts
    * and poison grams (every consumer — quality, packing, shingles —
    * inherits this one definition; the oracle SQL and the streaming Scala
    * twin apply the identical filter).
    */
  def wsTokens(text: Column): Column =
    // NULL text tokenizes like empty text (null ≡ empty contract): a null
    // would otherwise null-propagate into size()/least() chains where
    // Spark's null-SKIPPING least/greatest silently fabricate values
    // (e.g. a 0.7 quality score for a content-free doc). Every oracle
    // tokenization CTE mirrors with `text IS NULL OR ...`.
    // Tokenization itself is the codegen'd byte-scan kernel
    // (graft.functions.WsTokens) — the former
    // `filter(split(trim(text), "\\s+"), _ =!= "")` chain ran the filter
    // HOF interpreted per element under ~40 query paths; semantics are
    // identical by the ASCII-whitespace byte argument at the kernel
    // (equivalence spec-pinned incl. control chars and multi-byte UTF-8;
    // the streaming Scala twin wsTokensScala is pinned against the SAME
    // Column, so stream ≡ batch parity carries over unchanged).
    coalesce(graft.functions.TextFunctions.wsTokensRaw(text),
      array().cast("array<string>"))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(wsTokens(text))

  /** The raw word-n-gram transform over a PRE-MATERIALIZED token-array
    * attribute — the one kernel behind shingling, winnowing, repetition
    * grams, and coverage (see Dedup.shinglesFromTokens for why `toks`
    * must be an attribute: the interpreted HOF path re-evaluates a
    * lambda's free subexpressions per element). Callers wrap their own
    * short-document fallback (whole-text gram vs empty array) and
    * post-ops (distinct, sort) — only the gram construction is shared,
    * so the four call sites cannot drift apart.
    */
  private[graft] def ngramArray(toks: Column, n: Int): Column =
    // Codegen'd kernel (graft.functions.NgramArrayExpr) since r18 — the
    // former transform(sequence(...), concat_ws(element_at...)) chain
    // evaluated interpreted per gram under every shingle/gram consumer;
    // semantics identical (null elements skip like concat_ws, < n
    // tokens → empty — every call site guards that case anyway),
    // equivalence spec-pinned.
    graft.functions.TextFunctions.ngramArray(toks, n)

  /** BPE-ish sub-token count: alpha runs, digit runs, and single other
    * non-space chars — the standard pre-tokenizer shape.
    */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  // coalesce: the null ≡ empty contract — regexp_count(NULL) is NULL,
  // which made this the ONE tokenizer entry point emitting three-valued
  // counts (callers' budget compares silently dropped null-text rows).
  def tokenCountBpe(text: Column): Column =
    coalesce(regexp_count(text, lit(bpePattern)), lit(0))

  /** Punctuation ratio: punctuation chars / total chars (0 for empty). */
  val punctClass = "[.,!?;:]"
  def punctRatio(text: Column): Column =
    // coalesce(length(...), 0): null text ratios like empty text.
    when(coalesce(length(text), lit(0)) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, punctClass, ""))).cast("double") /
        length(text).cast("double"))

  /** English stopword ratio among whitespace tokens (quality signal).
    * DELIBERATELY case-sensitive (unlike gopherQuality, which case-folds
    * its stopword scan): the quality/langid oracles, the DSIR target and
    * every downstream threshold were calibrated against this definition
    * — case-folding here is a candidate coordinated change (operator +
    * qualityScoreSqlExpr + langid SQL + threshold retune), not a drive-by
    * fix. */
  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  def stopwordRatio(text: Column): Column = {
    val toks = wsTokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(enStopwords: _*))).cast("double") /
        size(toks).cast("double"))
  }

  /** Mean token length over an ALREADY-TOKENIZED array — the kernel
    * shared with [[Curation.gopherQuality]]'s mean-word-length metric
    * (which verbatim-duplicated this fold because the text form below
    * tokenizes internally): one definition of the arithmetic, two
    * consumers.
    */
  private[graft] def meanTokenLenFromToks(toks: Column): Column =
    // Codegen'd length-sum kernel (graft.functions.TokenLenSum) — the
    // former aggregate HOF evaluated interpreted per element on the
    // gopher/token-stats hot path; semantics identical (char counts,
    // null element → null sum), spec-pinned.
    when(size(toks) === 0, 0.0).otherwise(
      graft.functions.TextFunctions.tokenLenSum(toks).cast("double") /
        size(toks).cast("double"))

  /** Mean whitespace-token length. */
  def meanTokenLen(text: Column): Column =
    meanTokenLenFromToks(wsTokens(text))

  /** Composite quality score in [0,1]: rewards reasonable length, penalizes
    * punctuation soup and stopword-free keyword mash. Deliberately simple
    * and SQL-re-expressible; the shape (length/punct/stopword mix) is the
    * standard heuristic-filter recipe.
    */
  /** Floor-quantization to 6 dp: floor of an IEEE double is unambiguous
    * and the division of the resulting integer-valued double by 1e6 is
    * one IEEE op — identical in every engine. `round(x, 6)` is NOT: at a
    * .5 boundary of the shortest decimal repr the engines disagree
    * (measured: round(41/640., 6) = 0.064063 Spark vs 0.064062 DuckDB),
    * so never round() a raw rational that an oracle hash-compares.
    */
  private def q6(c: Column): Column = Quant.q6(c)

  def qualityScore(text: Column): Column = {
    val lengthTerm = least(tokenCountWs(text).cast("double") / 100.0, lit(1.0))
    val punctTerm = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopTerm = least(stopwordRatio(text) * 5.0, lit(1.0))
    q6(lengthTerm * 0.4 + punctTerm * 0.3 + stopTerm * 0.3)
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Order fixes the argmax tie-break (first wins).
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht", "ist"))

  /** Per-language stopword hit count over the token set. */
  def langHits(text: Column, lang: String): Column = {
    val words = langStopwords.toMap.apply(lang)
    size(filter(wsTokens(text), t => t.isin(words: _*)))
  }

  /** Predicted language: argmax of hit counts, `und` (undetermined) when no
    * list hits; ties resolve in `langStopwords` order.
    */
  def langId(text: Column): Column = {
    val hits = langStopwords.map { case (l, _) => l -> langHits(text, l) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(h === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Document fingerprint: md5 of the normalized text (lower-cased,
    * whitespace-collapsed, trimmed). md5 is bit-identical across engines,
    * which keeps the fingerprint portable (and oracle-checkable).
    */
  def fingerprint(text: Column): Column =
    // Collapse FIRST, trim LAST: Spark trim strips only ASCII spaces, so
    // trimming the raw text leaves a leading/trailing tab or newline to
    // be collapsed into a boundary SPACE — '\thello' and 'hello' would
    // fingerprint differently despite the normalization contract. After
    // the \s+ collapse every boundary run is a single space, which trim
    // does remove. Oracle mirrors the same order.
    //
    // coalesce: null text ≡ empty text (the exact-dedup identity rule —
    // Dedup.exactGroups puts a null-text and an empty-text doc in ONE
    // group via md5(coalesce(text, ''))). A null-propagating fingerprint
    // disagreed with that on the OTHER content-identity surface: NULL
    // fingerprints never equi-join each other, silently dropping
    // null-text docs from any fingerprint-keyed matching.
    md5(trim(regexp_replace(lower(coalesce(text, lit(""))), "\\s+", " ")))

  // ---- assembled queries ------------------------------------------------

  /** Per-document token statistics. Null text counts as empty in EVERY
    * column (the null ≡ empty contract): without the coalesces,
    * ws_tokens was 0 while bpe_tokens/chars null-propagated — a
    * downstream sum/ratio would silently drop the rows one column
    * counts.
    */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCountWs(col("text")).as("ws_tokens"),
      // tokenCountBpe coalesces internally (null ≡ empty) — no outer wrap.
      tokenCountBpe(col("text")).as("bpe_tokens"),
      coalesce(length(col("text")), lit(0)).as("chars"))

  /** The default quantile points (ppm) — shared with the stats-index
    * serve so the two call sites and the SQL oracle body (which inlines
    * these values) can only change in lockstep.
    */
  val DefaultQuantilesPpm: Seq[Long] = Seq(250000L, 500000L, 750000L, 900000L)

  /** Exact per-language token-count quantiles (percentile_disc
    * semantics: the smallest length whose cumulative count reaches
    * ceil(q·total)), computed over the LENGTH HISTOGRAM rather than a
    * sort of the corpus.
    *
    * 100 TB shape: the corpus is touched by exactly ONE map-side-combined
    * aggregation (group by (lang, len) — a map-only tokenless count per
    * doc feeds it); every later step (running sum, quantile pick) runs
    * over histogram rows, bounded by distinct lengths × languages, not by
    * corpus size. A `percentile`/global-sort formulation would instead
    * range-shuffle every row. Quantiles are requested in ppm (integer),
    * and the rank test `cum·1e6 ≥ q·total` is pure integer arithmetic —
    * ceil() never materializes and no float crosses an engine boundary.
    * (Guard: cum·1e6 wraps past ~9.2e12 rows per language — raise to
    * decimal if a corpus ever exceeds that.)
    */
  def lengthQuantiles(docs: DataFrame,
      qsPpm: Seq[Long] = DefaultQuantilesPpm): DataFrame =
    quantilesFromHist(
      docs
        .select(col("lang"), tokenCountWs(col("text")).cast("long").as("len"))
        .groupBy(col("lang"), col("len")).agg(count(lit(1)).as("cnt")),
      qsPpm)

  /** The quantile tail of [[lengthQuantiles]] over an ALREADY-BUILT
    * `(lang, len, cnt)` histogram — factored out so a persisted
    * histogram at rest ([[StatsIndex]]) serves the identical quantiles
    * without touching the corpus. `hist` must hold one row per
    * (lang, len): duplicate keys would still cumulate correctly under
    * the RANGE window frame, but `cnt` semantics belong to the caller —
    * merge generations BEFORE calling.
    */
  private[graft] def quantilesFromHist(hist: DataFrame,
      qsPpm: Seq[Long]): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L),
      s"quantiles must be ppm in (0, 1e6]: $qsPpm")
    val spark = hist.sparkSession
    import spark.implicits._
    val wCum = Window.partitionBy(col("lang")).orderBy(col("len"))
    val wTot = Window.partitionBy(col("lang"))
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wTot))
      .crossJoin(broadcast(qsPpm.toDF("q")))
      .filter(col("cum") * lit(1000000L) >= col("q") * col("total"))
      .groupBy(col("lang"), col("q")).agg(min(col("len")).as("len"))
  }

  /** Per-document quality metrics. */
  def quality(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      q6(punctRatio(col("text"))).as("punct_ratio"),
      q6(stopwordRatio(col("text"))).as("stopword_ratio"),
      q6(meanTokenLen(col("text"))).as("mean_token_len"),
      qualityScore(col("text")).as("quality"))

  /** Language-ID with per-language evidence counts. */
  def languages(docs: DataFrame): DataFrame =
    docs.select(
      Seq(col("doc_id"), langId(col("text")).as("pred_lang")) ++
        langStopwords.map { case (l, _) => langHits(col("text"), l).as(s"hits_$l") }: _*)

  /** Fingerprints. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fingerprint"))

  /** MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003): hash every ORDERED word-`k`-gram, slide a `w`-wide
    * window over the hash sequence, keep each window's minimum — the
    * distinct selected values are the document's fingerprints. The
    * guarantee that makes this THE copy-detection sketch: any shared
    * substring of at least `w + k − 1` tokens yields at least one shared
    * fingerprint, and the selected density is ~2/(w+1) of all grams, so
    * the index stays small.
    *
    * Determinism/scale: the gram hash is the leading 15 hex chars of md5
    * (a 60-bit value both engines compute identically — same recipe as
    * the 60-bit SimHash); all three stages are HOF transforms over
    * MATERIALIZED array attributes (separate projections, one md5 per
    * gram — see Dedup.shinglesFromTokens for the re-evaluation trap), and
    * the final explode is `explode_outer` so InferFiltersFromGenerate
    * can't inline the pipeline into a filter. Map-only: no shuffle at all.
    *
    * Documents shorter than `k` tokens hash their whole text as one gram;
    * shorter than `w` grams contribute their single minimum.
    */
  def winnowingFingerprints(docs: DataFrame, k: Int = 3,
      w: Int = 4): DataFrame = {
    // Loud parameter guards (the fuzzyPairs rule): w = 0 silently emits
    // ZERO fingerprints for every document (empty slice, null min,
    // filtered) — a near-dup query would return no pairs with no error;
    // k = 0 collapses every gram to md5("") and every doc into one
    // quadratic clique.
    require(k >= 1, s"gram width k=$k must be >= 1")
    require(w >= 1, s"window w=$w must be >= 1")
    // Per-doc null-id rule (the tfIdfTopTerms/paragraphDedup family
    // filter, oracle-mirrored): a null-id doc's fingerprints can never
    // pair (a < b rejects NULL) so hashing it is pure waste — and its
    // rows DID count into the downstream df cap census, a latent
    // cap-boundary divergence on a nullable regen.
    val toks = docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
    // The gram build, per-gram 60-bit md5 hash, and sliding-window
    // distinct-min run as ONE codegen kernel since r18
    // (graft.functions.WinnowFingerprintsExpr — the former three HOF
    // stages evaluated interpreted per element; semantics identical,
    // equivalence spec-pinned against the old expression forms).
    val fps = toks.select(col("doc_id"),
      graft.functions.TextFunctions
        .winnowFingerprints(col("toks"), k, w).as("fps"))
    // Token-less docs now carry an EMPTY fps array (no phantom
    // fingerprint-of-""), so every blank/null doc would otherwise join
    // every other through one shared hash — a quadratic clique on a
    // single hot key at crawl scale. The post-explode null filter keeps
    // them out while preserving the explode_outer plan shape (inner
    // explode re-triggers InferFiltersFromGenerate re-tokenization).
    fps.select(col("doc_id"), explode_outer(col("fps")).as("fingerprint"))
      .where(col("fingerprint").isNotNull)
  }

  /** Winnowing near-duplicate candidates: pairs of documents sharing at
    * least `minShared` winnowing fingerprints — the MOSS match step. The
    * pair join runs on the fingerprint table (≈ 2/(w+1) the gram count),
    * and fingerprints appearing in more than `maxDf` documents are
    * dropped FIRST: a boilerplate fingerprint shared by f docs would
    * contribute f² join rows, and it carries no dedup signal anyway —
    * the same hot-key cap every inverted-index matcher applies. The
    * shared count is computed map-side per (a, b) bucket before the
    * aggregation exchange.
    */
  def winnowNearDupCandidates(docs: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 50): DataFrame = {
    // One row per doc per fingerprint; materialized once — the self-join
    // would otherwise re-run the whole winnowing pipeline per side. The
    // pair result comes back eagerly materialized, so the fingerprint
    // blocks release immediately instead of living until driver GC.
    // release in finally: Verify/Bench catch per-query failures and keep
    // running, so a success-only release would strand the fingerprint
    // checkpoint blocks for the rest of the session.
    val fp = winnowingFingerprints(docs, k, w).barrier()
    try sharedFingerprintPairs(fp, minShared, maxDf)
    finally Barrier.release(fp)
  }

  /** The candidate-pair discipline over a MATERIALIZED fingerprint table —
    * hot-fingerprint df cap first, a<b self-join, shared-count threshold.
    * One definition shared by [[winnowNearDupCandidates]], [[dupSpans]]
    * and [[Multimodal.frameDups]] (media chunk hashes are just another
    * fingerprint modality), so the cap/join rules cannot diverge between
    * them.
    */
  private[graft] def sharedFingerprintPairs(fp: DataFrame, minShared: Int,
      maxDf: Int): DataFrame = {
    // Guard ONCE for every caller (winnow/dupSpans/media had hand-copied
    // requires at some sites and none at others — the parity hole):
    // maxDf <= 0 would silently prune EVERY fingerprint (this family's
    // cap keeps df <= maxDf; it has no 0-means-uncapped sentinel, unlike
    // the minhash/simhash caps), and minShared <= 0 keeps all-pairs.
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    require(maxDf >= 1,
      s"maxDf=$maxDf must be >= 1 — this cap has no uncapped sentinel " +
        "(df <= maxDf keeps nothing at 0); pass a large cap instead")
    val rare = fp.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fingerprint"))
    // Materialized: BOTH self-join sides read the pruned table, and
    // exchange reuse is a runtime maybe — unbarriered, the df
    // aggregation + rare join re-plan per side. The pair result (tiny)
    // materializes eagerly so the pruned blocks release on exit.
    val pruned = fp.join(rare, Seq("fingerprint")).barrier()
    try {
      pruned.as("a").join(pruned.as("b"),
          col("a.fingerprint") === col("b.fingerprint") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
        .barrier()
    } finally Barrier.release(pruned)
  }

  /** WITHIN-document duplicate-n-gram character coverage (the remaining
    * Gopher repetition family, Rae et al. A1.1: "fraction of characters
    * contained in duplicate n-grams"): the share of a document's token
    * characters covered by ANY occurrence of an n-gram that repeats
    * inside the document. Unlike the top-n-gram share this measures the
    * UNION of all repeated spans, so interleaved boilerplate that no
    * single gram dominates still scores high.
    *
    * Entirely map-side — no shuffle, no explode. Shape: (gram, start)
    * pairs sorted BY GRAM so equal grams are adjacent; one run-length
    * fold collects the start position of every occurrence of a repeated
    * gram; a second fold walks those starts as a sorted interval union
    * (start p covers tokens [p, p+n−1]), counting each covered token and
    * its characters exactly once. O(G log G) sort + two linear folds per
    * document. The naive formulation — a per-gram `array_contains`
    * membership probe against the repeated-gram set — was O(G·R) string
    * compares and measured 6.6 s of this query's 7.5 s at sf0.1; the
    * sorted-pair form removes the membership test entirely. All
    * attributes are materialized before their HOF consumers
    * (re-evaluation trap, see Dedup.shinglesFromTokens).
    */
  def dupNgramCoverage(docs: DataFrame, n: Int = 5): DataFrame = {
    // The winnowingFingerprints k-guard rule: n <= 0 silently emits
    // all-empty grams and coverage 0 for every doc after paying the
    // full per-doc sort.
    require(n >= 1, s"n=$n must be >= 1")
    val toks = docs.select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val grams = toks.select(col("doc_id"), col("toks"),
      when(size(col("toks")) >= n, ngramArray(col("toks"), n))
        .otherwise(array().cast("array<string>")).as("grams"))
    // (gram, 1-based start) sorted by gram (struct order: field 1, then 2).
    val pairs = grams.select(col("doc_id"), col("toks"),
      when(size(col("grams")) === 0,
        array().cast("array<struct<g:string,i:int>>"))
        .otherwise(sort_array(zip_with(col("grams"),
          sequence(lit(1), size(col("grams"))),
          (g, i) => struct(g.as("g"), i.as("i"))))).as("pairs"))
    // Run-length fold: on a run's second element append BOTH the run's
    // first start (carried as previ) and the current one; on later run
    // elements append the current start — every occurrence of a repeated
    // gram lands exactly once.
    val posState = struct(lit("").as("prev"), lit(0).as("previ"),
      lit(0L).as("run"), array().cast("array<int>").as("acc"))
    val withStarts = pairs.select(col("doc_id"), col("toks"),
      array_sort(aggregate(col("pairs"), posState,
        (st, p) => {
          val same = p("g") === st("prev")
          val nrun = when(same, st("run") + 1).otherwise(lit(1L))
          val acc = when(same && st("run") === 1L,
              concat(st("acc"), array(st("previ"), p("i"))))
            .when(same, concat(st("acc"), array(p("i"))))
            .otherwise(st("acc"))
          struct(p("g").as("prev"), p("i").as("previ"), nrun.as("run"),
            acc.as("acc"))
        },
        st => st("acc"))).as("starts"))
    // Interval-union walk over the sorted repeated starts: the carried
    // `end` clips overlapping spans, so each covered token is counted
    // (and its chars summed) exactly once. A start p's span end p+n−1 is
    // ≤ T by construction (the gram exists).
    val covState = struct(lit(0).as("end"), lit(0L).as("cnt"),
      lit(0L).as("chars"))
    val cov = aggregate(col("starts"), covState,
      (st, p) => {
        val s0 = greatest(p, st("end") + 1)
        val e0 = p + (n - 1)
        val len = e0 - s0 + 1
        val chars = when(len > 0,
          aggregate(slice(col("toks"), s0, len), lit(0L),
            (a, t) => a + length(t))).otherwise(lit(0L))
        struct(greatest(st("end"), e0).as("end"),
          (st("cnt") + when(len > 0, len).otherwise(0).cast("long")).as("cnt"),
          (st("chars") + chars).as("chars"))
      })
    withStarts.select(col("doc_id"), col("toks"), cov.as("cov"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        col("cov")("cnt").as("covered_tokens"),
        when(size(col("toks")) === 0, 0.0).otherwise(Quant.r6(
          col("cov")("chars").cast("double") /
          aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).cast("double")))
          .as("dup_char_fraction"))
  }

  /** Corpus-frequency token-rarity profile per document — the unigram-LM
    * quality signal without the logarithm: `mean_freq` (average corpus
    * occurrence count of the document's tokens), `min_freq` (its rarest
    * token), and `hapax_share` (fraction of tokens occurring exactly once
    * in the corpus — high = noise/garble, near-zero = pure boilerplate).
    * A true log-prob score would hash-poison the oracle (`ln` is only
    * correct-to-1-ulp and engine-dependent); integer frequency sums and
    * one exact division carry the same ranking signal bit-identically.
    *
    * Scale shape: one hash aggregation keyed on the token builds the
    * frequency table; the exploded corpus joins it keyed on the token and
    * re-aggregates per doc — two shuffles, both on small keyed rows. The
    * (doc_id, token) explode is persisted: it feeds both the frequency
    * aggregation and the join (see tfIdfTopTerms). The zero-token
    * re-attach scans only the pruned doc_id column.
    */
  /** (doc_id, token) exploded pairs. `explode_outer` + a null filter on
    * the exploded ATTRIBUTE, the [[Dedup.explodedShingles]] discipline:
    * an INNER explode — even of a pre-materialized alias — lets
    * InferFiltersFromGenerate push a `size(toks) > 0` filter below the
    * projection with the alias SUBSTITUTED, re-running the regex
    * tokenization once more per document (empirically confirmed on
    * Spark 4.1.2: the materialize-first form this function previously
    * used still re-inlined the split; plan-locked now). The outer
    * variant skips the rule; the empty-array null row is filtered above
    * the Generate, where nothing can be pushed. wsTokens elements are
    * never null, so the filter drops ONLY the synthetic row — output
    * identical to the inner explode.
    */
  private[graft] def explodedTokens(docs: DataFrame,
      as: String = "token"): DataFrame =
    docs.select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as(as))
      .where(col(as).isNotNull)

  /** Corpus token-frequency SPECTRUM — the Zipf/power-law diagnostic a
    * curation operator reads to judge vocabulary health (a natural
    * corpus shows a long hapax tail and a thin head; a template-heavy or
    * deduplication-starved crawl collapses the tail): per frequency
    * octave k (2^k <= count < 2^(k+1)), the number of distinct tokens in
    * the octave and their total occurrences.
    *
    * Determinism: k = floor(log2(count)) is computed as
    * `length(bin(count)) - 1` — pure integer/string ops, identical in
    * both engines, where the IEEE ln-ratio form (`log2` is
    * Math.log(x)/Math.log(2) on the JVM) is NOT exact at power-of-two
    * boundaries and may bucket 2^k into k-1 on one engine only.
    *
    * Scale shape: the classic word-count exchange (map-side partial
    * counts on the token key) followed by a ≤64-row octave fold —
    * nothing else touches the corpus.
    */
  def freqSpectrum(docs: DataFrame): DataFrame =
    explodedTokens(docs)
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .groupBy((length(bin(col("c"))) - 1).cast("long").as("k"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("c")).as("occurrences"))

  def tokenRarity(docs0: DataFrame): DataFrame = {
    // Null-id docs dropped up front, oracle-mirrored (the family rule):
    // their tokens otherwise grouped under the NULL key and the
    // re-attach equi-join below never matched it — a content-bearing
    // null-id doc reported n_tokens = 0 while its tokens still skewed
    // corpus frequencies.
    val docs = docs0.where(col("doc_id").isNotNull)
    // r18-cont rebalance (measured, sf0.1: 1.72 s cached vs 0.79 s this
    // shape): persisting the exploded corpus×token table for its 2
    // consumers cost more than recomputing the kernel tokenization once
    // per consumer. Barrier only the VOCAB-sized frequency table; the
    // map-only token pipeline runs once into its exchange and once under
    // the scoring join — and no corpus-sized cache pins executors at
    // 100 TB.
    val toks = explodedTokens(docs)
    val freq = Barrier(
      toks.groupBy(col("token")).agg(count(lit(1)).as("freq")))
    try {
      val perDoc = toks.join(freq, Seq("token"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("freq")).as("freq_sum"),
          min(col("freq")).as("min_freq"),
          count(when(col("freq") === 1L, lit(1))).as("hapax"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(q6(col("freq_sum").cast("double") /
            col("n_tokens").cast("double")), lit(0.0)).as("mean_freq"),
          coalesce(col("min_freq"), lit(0L)).as("min_freq"),
          coalesce(q6(col("hapax").cast("double") /
            col("n_tokens").cast("double")), lit(0.0)).as("hapax_share"))
        .barrier() // materialize before releasing the freq barrier
    } finally Barrier.release(freq)
  }

  /** Adjacent-bigram structs of a token array: the array zipped against
    * itself shifted by one (the Bpe.adjacentPairs shape). NULL (not an
    * error) below 2 tokens — slice throws on a negative length, and the
    * guard must live INSIDE the expression: a separate size filter gets
    * pushed below the token projection and re-inlines the tokenization
    * into the Filter several times over (caught by the plan lock).
    */
  private def bigramArray(tk: Column): Column =
    // Codegen'd kernel (graft.functions.BigramsExpr) since r18 — the
    // former guarded zip_with(slice, slice) evaluated interpreted per
    // pair; semantics identical (< 2 tokens → NULL, the
    // when-without-otherwise), equivalence spec-pinned.
    graft.functions.TextFunctions.bigrams(tk)

  /** Bigram language-model quality scoring — the KenLM-perplexity-filter
    * stage of a web-corpus pipeline (CCNet / Gopher both gate on an
    * n-gram LM): train an add-one-smoothed bigram model on the corpus in
    * one aggregation chain, then score every document by its mean
    * next-token probability. Natural text scores high (its bigrams are
    * corpus-frequent); gibberish, boilerplate soup, and wrong-language
    * text score low.
    *
    * DOCUMENTED DEVIATION from log-space perplexity: the score is the
    * arithmetic mean of the smoothed bigram probabilities, not the
    * geometric mean (perplexity), because `ln` is the one sub-expression
    * whose cross-engine IEEE agreement we could not certify (the BM25
    * rational-idf rationale, Search.scala). The mean probability ranks
    * the same "predictable vs surprising" axis and keeps the whole
    * computation in INTEGER arithmetic end to end:
    *
    *   p_micro(w1,w2) = (c2(w1,w2) + 1) * 1e6  div  (c1(w1) + V)
    *   lm_micro(doc)  = sum over positions of p_micro  div  n_bigrams
    *
    * with c2 = corpus bigram count, c1 = corpus prefix count (bigrams
    * starting with w1), and V = |distinct prefixes| as the smoothing
    * denominator (the conditioning vocabulary: a token that never starts
    * a bigram conditions nothing). Integer div is exact on every engine —
    * no doubles anywhere. Long headroom: (c2+1)·1e6 wraps past ~9.2e12
    * bigram occurrences of ONE pair; at that corpus scale widen the
    * micro expression to decimal(38,0) (the trainKeyedBooks lesson).
    *
    * Scale shape: bigrams materialize map-side from the token array
    * (explode of a projected attribute — the explodedTokens discipline),
    * pre-reduced per (doc, w1, w2) so the corpus exchanges ONCE on the
    * bigram key at its reduced size; the model tables (c2, c1, V) are
    * vocabulary-sized aggregations of that same reduced table; scoring
    * re-joins the reduced table against the model and folds per doc.
    * Token-less and single-token docs exit the pipeline and re-enter
    * via the left join with (0, 0) — the null ≡ empty contract.
    */
  def bigramLmScores(docs0: DataFrame): DataFrame = {
    // Null-id docs dropped up front (the family rule, oracle-mirrored
    // in the shared tks/lmdoc CTEs): docBigrams grouped their bigrams
    // under the NULL key — training the model on them while the scoring
    // re-attach reported the doc itself as (0, 0) — and the STREAMING
    // twin already dropped them, a latent stream ≡ batch split.
    val docs = docs0.where(col("doc_id").isNotNull)
    // r18-cont rebalance (measured, sf0.1): caching the CORPUS-sized
    // bigram table cost more than recomputing it under the text kernels
    // (2.81 s cached vs 1.90 s with this shape). The pair-vocab-sized c2
    // barrier is what the model chain actually multi-reads (c1, V, and
    // the model join all derive from it); the scoring join re-runs the
    // kernel bigram pipeline once — cheaper than the cache fill + cached
    // re-reads it replaces, and the 100 TB shape stops pinning a
    // corpus-sized table on executors.
    val d = docBigrams(docs)
    val c2 = Barrier(pairCounts(d, "c2"))
    try bigramLmTail(docs, d, c2).barrier()
    finally Barrier.release(c2)
  }

  /** Corpus bigram pair counts over a [[docBigrams]] table — the
    * pair-vocab-sized table the PMI tail and the LM model chain both
    * fan out from (alias differs per consumer).
    */
  private[graft] def pairCounts(d: DataFrame, as: String): DataFrame =
    d.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as(as))

  /** The per-(doc, w1, w2) reduced bigram table — the one corpus-sized
    * input both the model aggregation and the scoring join read.
    */
  private[graft] def docBigrams(docs: DataFrame): DataFrame =
    // Null-id rows excluded at the CHAIN HEAD (oracle tks CTE mirrored):
    // every consumer — LM scoring, PMI margins, the collected model —
    // shares the rule, so a null-id doc's bigrams can neither train a
    // model that never scores it nor skew the collocation margins.
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"), wsTokens(col("text")).as("tk"))
      .select(col("doc_id"), bigramArray(col("tk")).as("bg"))
      // explode_outer + attribute null-filter, NOT explode after a size
      // filter: InferFiltersFromGenerate / filter pushdown would inline
      // the whole tokenization into a Filter below the projections (the
      // InferFiltersFromGenerate-safe shape, round-8 notes).
      .select(col("doc_id"), explode_outer(col("bg")).as("b"))
      .filter(col("b").isNotNull)
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))

  /** Top-k bigram COLLOCATIONS by pointwise mutual information — the
    * lexical-statistics pass that surfaces multiword units ("new york")
    * a tokenizer or stopword list should know about. PMI here is defined
    * over the bigram table's own margins (p(x,·), p(·,y)), so the whole
    * score stays a rational of counts the model tables already hold — no
    * extra corpus pass, no logs (the bigram-LM / BM25 no-`ln` rationale;
    * `log` is monotone, so the RANKING is the textbook PMI ranking):
    *
    *   score_ppm = c_xy · M · 1e6  div  (c_x· · c_·y)
    *
    * with M = total bigram occurrences, c_x· / c_·y the prefix/suffix
    * margins. `minCount` drops hapax pairs whose PMI is pure noise (the
    * standard collocation guard). Long headroom: c_xy·M·1e6 wraps past
    * ~9.2e18 — at that corpus scale widen to decimal(38,0) and ANSI mode
    * fails loudly at the wrap point, never silently (the BM25 rule).
    *
    * Scale shape: ONE corpus-sized exchange (the reduced (doc, w1, w2)
    * bigram table), vocabulary-sized margins joined back hash-to-hash,
    * and the top-k plans as TakeOrderedAndProject (plan-locked) — never
    * a full sort of the pair table.
    */
  def pmiTopK(docs: DataFrame, k: Int = 20, minCount: Long = 5L)
      : DataFrame = {
    require(k >= 1 && k <= 10000, s"k=$k outside [1, 10000]")
    require(minCount >= 1L, s"minCount=$minCount must be >= 1")
    // r18-cont rebalance (measured, sf0.1): the bigram table has exactly
    // ONE consumer here — the pair aggregation — so caching it was pure
    // overhead once the text kernels made recompute cheap (registered
    // form 2.27 s vs 0.85 s for this shape). Barrier the
    // pair-vocab-sized c2 instead; the four margin/total branches read
    // the checkpoint, and the corpus pipeline runs exactly once.
    val c2 = Barrier(pairCounts(docBigrams(docs), "c_xy"))
    try pmiTail(c2, k, minCount).barrier()
    finally Barrier.release(c2)
  }

  /** [[pmiTopK]] over the (barriered) pair-count table — factored for the
    * plan lock (the eager barrier hides the tail behind Scan ExistingRDD).
    */
  private[graft] def pmiTail(c2: DataFrame, k: Int, minCount: Long)
      : DataFrame = {
    val cx = c2.groupBy(col("w1")).agg(sum(col("c_xy")).as("c_x"))
    val cy = c2.groupBy(col("w2")).agg(sum(col("c_xy")).as("c_y"))
    val m = c2.agg(sum(col("c_xy")).as("m"))
    c2.where(col("c_xy") >= minCount)
      .join(cx, Seq("w1")).join(cy, Seq("w2"))
      .crossJoin(broadcast(m))
      // DECIMAL(38,0) numerator (the BM25 rank-sum discipline): c_xy·M·1e6
      // wraps a long near 9.2e18 — at ~3e6 total bigram occurrences of one
      // pair — while the decimal form carries to 1e38 and ANSI still fails
      // loudly past that. IntegralDivide emits BIGINT either way, so the
      // output column type (and the oracle's // arithmetic) is unchanged.
      // …and the DENOMINATOR: two stopword margins near 3e9 each would
      // overflow a long product at the very corpus scale the numerator
      // widening targets (ANSI throws; non-ANSI would silently wrap).
      .withColumn("score_ppm",
        expr("CAST(c_xy AS DECIMAL(38,0)) * m * 1000000 div " +
          "(CAST(c_x AS DECIMAL(38,0)) * c_y)"))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        col("score_ppm"))
      .orderBy(col("score_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Model training + scoring over a [[docBigrams]] table and its
    * (barriered) [[pairCounts]] — factored out so the plan lock asserts
    * on the REAL plan (the eager barrier in [[bigramLmScores]] hides it
    * behind Scan ExistingRDD — the kmeansSearchPlan pattern).
    */
  private[graft] def bigramLmTail(docs: DataFrame, d: DataFrame,
      c2: DataFrame): DataFrame = {
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    val model = c2.join(c1, Seq("w1")).crossJoin(broadcast(v))
    val perDoc = d.join(model, Seq("w1", "w2"))
      .withColumn("micro",
        expr("((c2 + 1L) * 1000000L) div (c1 + v)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        expr("sum(micro * cnt) div sum(cnt)").as("lm_micro"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_micro"), lit(0L)).as("lm_micro"))
  }

  /** Spearman rank agreement between quality signals — the filter-audit
    * report a curation operator reads before stacking gates: two filters
    * with ρ near 1 are redundant (one is a proxy for the other — on this
    * synthetic corpus the heuristic quality score correlates 0.88 with
    * raw length), while near-0 pairs measure genuinely different axes
    * (the bigram-LM score is independent of both). One row per column
    * pair: (pair, n, sum_d2, rho).
    *
    * DOCUMENTED DEVIATION from textbook Spearman: ties break
    * deterministically on doc_id (ranks are a permutation, so
    * ρ = 1 − 6·Σd² / (n(n²−1)) holds exactly) instead of averaged
    * fractional ranks — the tie-broken ranks keep every intermediate an
    * integer; the single IEEE division is floor-quantized (q6).
    *
    * Scale shape: ranks are EXACT but computed by quantile BINNING, not a
    * single global window — approximate quantile boundaries (a bounded
    * driver collect of `rankBuckets−1` doubles per column) split each
    * column into buckets that are monotone in the score order, so
    *
    *   global_rank = row_number OVER (PARTITION BY bucket) + Σ counts of
    *                 lower buckets  (a ≤ rankBuckets+2-row literal)
    *
    * holds exactly whatever the boundaries are (boundary quality affects
    * only balance, never correctness — ties share a bucket and resolve on
    * the within-bucket (score, doc_id) order). Every window is
    * partitioned; nothing corpus-sized funnels through one task.
    * `rankBuckets = 1` keeps the single-window form (the spec reference —
    * the two paths are pinned equal).
    */
  def scoreAgreement(scores0: DataFrame, cols: Seq[String],
      rankBuckets: Int = 64): DataFrame = {
    require(cols.size >= 2, "scoreAgreement needs at least two score columns")
    require(rankBuckets >= 1 && rankBuckets <= 4096,
      s"rankBuckets=$rankBuckets outside [1, 4096]")
    // doc_id is the TIE-BREAK key, so rho is only deterministic when it
    // is unique and non-null: null-id rows (all tied on the key) would
    // rank in shuffle-dependent — and per-column INCONSISTENT — order,
    // flipping d² run to run. Null ids are dropped here (the family
    // rule; the registered query's inner joins already did); uniqueness
    // of the non-null ids stays the caller's contract.
    val scores = scores0.where(col("doc_id").isNotNull)
    // The ranked table feeds EXACTLY ONE consumer — agreementTail's
    // single aggregation — so it is NOT materialized (the former cache
    // cost one extra corpus-sized fill pass per invocation for zero
    // reuse); only the INPUT is cached on the binned path, where the
    // boundary estimation, the count pass, and the rank pass each read
    // it (the registered query's input embeds the full bigram-LM chain).
    if (rankBuckets == 1) {
      val ranked = cols.foldLeft(scores) { (df, c) =>
        df.withColumn(s"__r_$c", row_number().over(
          Window.orderBy(col(c).asc_nulls_last, col("doc_id").asc))
          .cast("long"))
      }
      agreementTail(ranked.select(
        col("doc_id") +: cols.map(c => col(s"__r_$c")): _*), cols)
    } else
      Barrier.withCached(scores) { s =>
        val ranked = binnedRanks(s, cols, rankBuckets)
        agreementTail(ranked.select(
          col("doc_id") +: cols.map(c => col(s"__r_$c")): _*), cols)
      }
  }

  /** Exact global ranks (`__r_<col>`) via quantile binning — every window
    * PARTITIONED by the bucket column (plan-locked: no unpartitioned
    * corpus-sized window anywhere in the registry). Bucket assignment
    * `#{boundary < value}` is monotone in the score, null scores take a
    * dedicated final bucket (matching asc_nulls_last), and the per-bucket
    * offsets are a bounded literal when-chain. Heavy ties concentrate in
    * one bucket — the partition is then bounded by the tie count, the
    * standard quantile-binning caveat.
    */
  private[graft] def binnedRanks(s: DataFrame, cols: Seq[String],
      nb: Int): DataFrame = {
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    // One pass estimates every column's boundaries (null-ignoring). The
    // relative error is a BALANCE knob only — exactness never depends on
    // where a boundary lands — so the sketch stays coarse and cheap.
    val allBounds = s.stat.approxQuantile(cols.toArray, probs, 0.01)
    val sortedBounds = cols.zip(allBounds)
      .map { case (c, bs) => c -> bs.distinct.sorted }.toMap
    // Bucket assignment `#{boundary < value}` as ONE fold over a literal
    // boundary ARRAY — profiled: the previous per-boundary when-chain
    // (63 nested whens × 3 columns, re-inlined into every downstream
    // window/aggregate tree and again into each union leg of the pair
    // tail) made Catalyst analysis+codegen the dominant cost of the
    // whole query at verification SF (~2.7 s of a 5 s query on a CACHED
    // 5k-row input). A literal array is one plan node whatever nb is.
    // Long→double in the compare is monotone (ties collapse into one
    // bucket; within-bucket order uses the ORIGINAL column), so
    // exactness survives values past 2^53.
    val withBuckets = cols.foldLeft(s) { (df, c) =>
      val bs = sortedBounds(c)
      val nonNull =
        if (bs.isEmpty) lit(0)
        else aggregate(lit(bs), lit(0),
          (acc, b) => acc + when(col(c).cast("double") > b, 1).otherwise(0))
      df.withColumn(s"__b_$c",
        when(col(c).isNull, lit(bs.length + 1)).otherwise(nonNull))
    }
    // ALL columns' bucket counts in ONE aggregation job, shaped as an
    // explode → groupBy over (column, bucket) pairs rather than one
    // sum(when) aggregate per (column, bucket): the flat-aggregate form
    // was ~|cols|·domain ≈ 200 aggregate expressions whose codegen alone
    // cost ~1 s per invocation at verification SF (profiled) — the
    // explode form is a constant-size plan whatever nb is, and the
    // exploded row count is only |cols|·n.
    val domains = cols.map(c => c -> (sortedBounds(c).length + 2)).toMap
    val cntMap: Map[(String, Int), Long] = withBuckets
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(s"__b_$c").as("b"))): _*)).as("x"))
      .groupBy(col("x.c").as("c"), col("x.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    cols.foldLeft(withBuckets) { (df, c) =>
      // Empty buckets (no rows landed between two boundaries) count 0.
      val cnts = (0 until domains(c)).map(b => cntMap.getOrElse((c, b), 0L))
      // Offset per bucket = rows in all LOWER buckets; a literal array
      // indexed by the bucket (element_at is 1-based) for the same
      // tree-size reason as the boundary fold above.
      val offs: Array[Long] = cnts.scanLeft(0L)(_ + _).init.toArray
      df.withColumn(s"__r_$c",
        row_number().over(Window.partitionBy(col(s"__b_$c"))
          .orderBy(col(c).asc_nulls_last, col("doc_id").asc))
          .cast("long") + element_at(lit(offs), col(s"__b_$c") + lit(1)))
    }
  }

  /** The pair-correlation tail over a cached `(doc_id, __r_*)` table —
    * shared by both rank paths.
    */
  private def agreementTail(r: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs =
      for { i <- cols.indices; j <- i + 1 until cols.size }
        yield (i, j)
    // ONE aggregation computes n and EVERY pair's Σd² in a single pass,
    // then a literal struct-array explode lays the per-pair rows out —
    // profiled: the previous per-pair agg legs (unioned) each carried
    // and re-analyzed the full ranked subtree, and at verification SF
    // that plan work, not data, dominated the query.
    // Scratch aliases are INDEX-keyed (__s_0_2), never name-keyed: with
    // underscore-bearing column names, name concatenation can collide
    // across pairs — ("x","y_z") and ("x_y","z") both spell __s_x_y_z —
    // and the single agg would then throw AMBIGUOUS_REFERENCE on inputs
    // the old per-pair form accepted.
    // DECIMAL(38,0) accumulators: Σd² is ~n³/6 (n³/3 anti-correlated)
    // and wraps a long past ~3-4M docs — the silent-wrap class
    // trainKeyedBooks/indexHealth already widened for. The display
    // column casts back to long (exact at any audit scale; a sum past
    // 9.2e18 makes the ANSI cast THROW — loud, never garbage), and rho
    // is computed from the unwrapped decimal.
    val sums = pairs.map { case (i, j) =>
      val d = col(s"__r_${cols(i)}") - col(s"__r_${cols(j)}")
      sum((d * d).cast("decimal(38,0)")).as(s"__s_${i}_$j")
    }
    val nD = col("n").cast("double")
    val rows = pairs.map { case (i, j) =>
      struct(lit(s"${cols(i)}~${cols(j)}").as("pair"), col("n").as("n"),
        col(s"__s_${i}_$j").cast("long").as("sum_d2"),
        // rho undefined below 2 rows (n(n²-1)=0) — emit NULL, not a
        // division artifact.
        when(col("n") >= 2L,
          q6(lit(1.0) - lit(6.0) * col(s"__s_${i}_$j").cast("double") /
            (nD * (nD * nD - lit(1.0))))).as("rho"))
    }
    r.agg(count(lit(1)).as("n"), sums: _*)
      .select(explode(array(rows: _*)).as("__x"))
      .select(col("__x.pair").as("pair"), col("__x.n").as("n"),
        col("__x.sum_d2").as("sum_d2"), col("__x.rho").as("rho"))
      .barrier()
  }

  /** Driver-resident bigram-LM model — the offline-trained artifact the
    * streaming scoring twin consumes: corpus bigram counts, prefix
    * counts, and the conditioning-vocabulary size, with the SAME
    * semantics as [[bigramLmTail]]'s c2/c1/V aggregations (c1 and V are
    * derived from c2 here exactly as the relational tail derives them).
    */
  final case class BigramLmModel(c2: Map[(String, String), Long],
      c1: Map[String, Long], v: Long)

  /** Collect the bigram model to the driver. Vocabulary-sized — bounded
    * by `maxVocab` distinct bigrams (limit-before-collect, so a hostile
    * corpus throws instead of OOMing the driver). At web scale keep the
    * model as the relational tables and score with [[bigramLmScores]];
    * the collected form exists for ingest-time scoring of a stream
    * against a frozen model (the DSIR/NB twin lifecycle).
    */
  def bigramLmModel(docs: DataFrame,
      maxVocab: Int = 2000000): BigramLmModel = {
    val rows = docBigrams(docs)
      .groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("c2"))
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"bigram vocabulary exceeds maxVocab=$maxVocab — train relationally" +
        " (bigramLmScores) or raise the bound")
    val c2 = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val c1 = c2.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    // Fail at TRAIN time on a bigram-free corpus (v = 0): scoring any
    // incoming doc against such a model would divide by zero mid-stream,
    // where the relational batch path computes its own v and never does.
    require(c1.nonEmpty,
      "bigram-free training corpus (no doc has >= 2 tokens) — nothing " +
        "to model")
    BigramLmModel(c2, c1, c1.size.toLong)
  }

  /** Streaming twin of [[bigramLmScores]]' SCORING half: the crawl
    * pipeline trains the model offline and scores documents at ingest —
    * a pure stateless map once the model is driver-resident (no state,
    * no watermark, no shuffle; the model rides the task closure — at
    * production vocabulary sizes hand it to executors as a broadcast).
    * Tokenization is the Scala tokenizer twin (wsTokensScala — the
    * proven-parity replica of the Column-side wsTokens), so on a
    * replayed corpus the stream rows equal the batch rows EXACTLY
    * (spec-pinned). Unseen bigrams take the add-one smoothing fallback
    * (c2=0, and an unseen prefix contributes c1=0) — exactly what the
    * smoothing exists for at ingest time.
    */
  def streamingBigramLmScores(docs: DataFrame,
      model: BigramLmModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (c2, c1, v) = (model.c2, model.c1, model.v)
    docs
      // Null-id guard BEFORE the typed stage (the streamingDsirScores
      // rule): the non-nullable tuple encoder would otherwise kill the
      // stream on the first null-id row, where the batch twin emits it.
      .where(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val tk = graft.streaming.StreamingNearDup
          .wsTokensScala(Option(text).getOrElse(""))
        val bs = tk.zip(tk.drop(1))
        if (bs.isEmpty) (id, 0L, 0L)
        else {
          val micros = bs.map { case (w1, w2) =>
            ((c2.getOrElse((w1, w2), 0L) + 1L) * 1000000L) /
              (c1.getOrElse(w1, 0L) + v)
          }
          (id, bs.size.toLong, micros.sum / bs.size)
        }
      }.toDF("doc_id", "n_bigrams", "lm_micro")
  }

  /** Paragraph/chunk-level duplicate analysis — the WITHIN-corpus,
    * BELOW-document dedup stage modern pipelines run after doc-level
    * near-dup removal (duplicate-line removal in RefinedWeb/Dolma terms):
    * a document that survives doc-level dedup can still be 40% boilerplate
    * shared with other pages.
    *
    * The corpus here is single-line, so the "line/paragraph" unit is a
    * fixed `chunkTokens`-token non-overlapping window — same algebra as
    * newline splitting, deterministic on any text shape. Each chunk is
    * keyed by the md5 of its normalized text; a chunk is a duplicate when
    * its hash occurs in MORE THAN ONE document. Output per document:
    * chunk/token totals, duplicated-chunk count, `dup_chunk_fraction`,
    * and `kept_tokens` = tokens in chunks unique to this document (what a
    * cleaning pass would retain).
    *
    * Scale shape: chunking is map-only (HOF transforms over materialized
    * attributes); the duplicate test is ONE hash aggregation keyed on the
    * 32-char chunk hash (map-side combined — the shuffle never carries
    * text), re-joined to the exploded chunk table and re-aggregated per
    * doc. The corpus body is read once; everything after the explode
    * carries (doc_id, hash, n_tokens) triples only.
    */
  /** (chunk text, token length) structs over a PRE-MATERIALIZED token
    * attribute — chunk i covers tokens [i·chunkTokens, (i+1)·chunkTokens);
    * the last chunk may be short; an empty doc yields one zero-length
    * pseudo-chunk (`clen = 0`). floor() because Column `/` is double
    * division. The single definition the chunk-dedup family shares
    * ([[paragraphDedup]], [[paragraphDedupClean]],
    * [[Curation.streamingChunkDedup]]) — a chunking change must not be
    * able to diverge between the counting, emission, and streaming paths.
    */
  private[graft] def chunkStructs(toks: Column, chunkTokens: Int): Column = {
    // One loud guard covers the whole chunk family: 0 divides by zero
    // inside the chunk-count expression (NaN -> ANSI cast failure deep in
    // a task), negatives crash slice() with no operator context.
    require(chunkTokens >= 1, s"chunkTokens=$chunkTokens must be >= 1")
    transform(
      sequence(lit(0),
        greatest(floor((size(toks) - 1).cast("double") / chunkTokens)
          .cast("int"), lit(0))),
      i => struct(
        concat_ws(" ", slice(toks, i * chunkTokens + 1, lit(chunkTokens)))
          .as("chunk"),
        least(size(toks) - i * chunkTokens, lit(chunkTokens))
          .as("clen")))
  }

  def paragraphDedup(docs0: DataFrame, chunkTokens: Int = 10): DataFrame = {
    // Null-id docs dropped up front (the family rule, oracle-mirrored):
    // the per-doc groupBy below would otherwise MERGE every null-id
    // doc's chunks into ONE pseudo-row (max/sum across different
    // documents) while their chunks still inflated the cross-doc df.
    val docs = docs0.where(col("doc_id").isNotNull)
    val toks = docs.select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val chunks = toks.select(col("doc_id"), size(col("toks")).as("n_toks"),
      chunkStructs(col("toks"), chunkTokens).as("cs"))
    // A token-less doc's single zero-length pseudo-chunk rides THROUGH the
    // aggregation (guarded by clen > 0 everywhere) instead of being
    // filtered and left-joined back — the re-attach base would re-scan and
    // re-tokenize the whole corpus as a second plan branch.
    // r18-cont rebalance (measured, sf0.1): the chunk-hash table feeds
    // BOTH the document-frequency aggregation and the re-join, but
    // persisting the corpus-sized (id, hash, longs) table cost more than
    // recomputing the kernel tokenize + chunk pipeline once per
    // consumer. Barrier only the DUPLICATED-hash set (cdf > 1 —
    // boilerplate-sized, orders of magnitude below the corpus); the dup
    // verdict becomes join PRESENCE (left-join match ⇔ cdf > 1 — the
    // bare `cdf <= 1` test would read NULL, not true, on unmatched
    // rows), and AQE can broadcast the tiny set.
    val ex = chunks
      .select(col("doc_id"), col("n_toks"), explode_outer(col("cs")).as("c"))
      .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
        md5(col("c.chunk")).as("ch"), col("c.clen").cast("long").as("clen"))
    // Cross-doc document frequency per chunk hash. count_distinct handles
    // a chunk repeated WITHIN one doc: that alone is not cross-doc dup.
    val dups = Barrier(ex.filter(col("clen") > 0).groupBy(col("ch"))
      .agg(count_distinct(col("doc_id")).as("cdf"))
      .filter(col("cdf") > 1)
      .select(col("ch"), lit(true).as("__dup")))
    try {
      ex.join(dups, Seq("ch"), "left")
        .groupBy(col("doc_id"))
        .agg(
          max(col("n_toks")).as("n_tokens"),
          count(when(col("clen") > 0, lit(1))).as("n_chunks"),
          sum(when(col("clen") > 0 && col("__dup").isNotNull, 1L)
            .otherwise(0L)).as("dup_chunks"),
          sum(when(col("clen") > 0 && col("__dup").isNull, col("clen"))
            .otherwise(0L)).as("kept_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
          col("dup_chunks"),
          when(col("n_chunks") > 0,
            Quant.r6(col("dup_chunks").cast("double") /
              col("n_chunks").cast("double"))).otherwise(0.0)
            .as("dup_chunk_fraction"),
          col("kept_tokens"))
        .barrier() // materialize before releasing the dup-set barrier
    } finally Barrier.release(dups)
  }

  /** The EMISSION half of chunk-level dedup: rebuild each document's text
    * with cross-doc duplicated chunks removed (what [[paragraphDedup]]
    * only counts). Output: (doc_id, kept_chunks, clean_tokens,
    * clean_hash) where clean_hash is the md5 of the kept chunks joined in
    * original order — small enough to hash-verify without shipping the
    * rewritten corpus through the driver.
    *
    * Scale shape: the duplicate-hash SET (boilerplate — orders of
    * magnitude smaller than the corpus) broadcasts into a map-side
    * LEFT ANTI join against the exploded chunks, so filtering shuffles
    * nothing; the one real exchange is the per-doc re-assembly groupBy —
    * the unavoidable cost of any corpus rewrite. Chunk order is restored
    * by position through `array_sort` on (pos, chunk) structs (collect_list
    * order is not deterministic; the sort is).
    */
  def paragraphDedupClean(docs0: DataFrame, chunkTokens: Int = 10): DataFrame = {
    // Null-id docs dropped up front (see paragraphDedup): the re-attach
    // equi-join below never matches a NULL key, so a content-bearing
    // null-id doc would read as "cleaned to empty" (clean_hash md5(''))
    // while its chunks still voted hashes into the duplicate set.
    val docs = docs0.where(col("doc_id").isNotNull)
    val toks = docs.select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val chunks = toks.select(col("doc_id"),
      chunkStructs(col("toks"), chunkTokens).as("cs"))
    // The persisted rows carry the hash ALONGSIDE the chunk text: the dup
    // aggregation and the anti-join probe both consume it, and computing
    // md5 inside the join condition would re-hash every chunk of the
    // corpus a second time. The counting half (paragraphDedup) dropped
    // its cache in the r18-cont rebalance, but HERE the cache stays —
    // measured at sf0.1, recomputing this WIDE chunk-text pipeline
    // (interpreted chunkStructs + per-chunk md5 + the text payload)
    // twice reads 1.36 s vs 1.17 s cached: the recompute-beats-cache
    // rule holds only for hash/count-narrow pipelines.
    Barrier.withCached(chunks
        .select(col("doc_id"), posexplode_outer(col("cs")).as(Seq("pos", "c")))
        .filter(col("c.clen") > 0)
        .select(col("doc_id"), col("pos"), col("c.chunk").as("chunk"),
          md5(col("c.chunk")).as("ch"), col("c.clen").cast("long").as("clen"))) { ex =>
    val dups = ex.groupBy(col("ch"))
      .agg(count_distinct(col("doc_id")).as("cdf"))
      .filter(col("cdf") > 1)
      .select(col("ch"))
    // No broadcast hint: `dups` grows with corpus-wide boilerplate (a
    // 100TB crawl can carry billions of distinct duplicated chunks,
    // past the broadcast hard limit); AQE broadcasts when it fits.
    val kept = ex.join(dups, Seq("ch"), "left_anti")
    val agg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_chunks"),
        sum(col("clen")).as("clean_tokens"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s("chunk")))).as("clean_hash"))
    // Re-attach documents that vanished from the rewrite — empty docs and
    // docs whose EVERY chunk is cross-doc boilerplate: "cleaned to empty"
    // must stay distinguishable from "never existed", and it is what
    // paragraphDedup's counting half reports for the same input. The
    // re-attach base is a doc_id-only column-pruned scan (no second
    // tokenization).
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        coalesce(col("clean_tokens"), lit(0L)).as("clean_tokens"),
        coalesce(col("clean_hash"), md5(lit(""))).as("clean_hash"))
      .barrier() // release the chunk cache on exit
    }
  }

  /** ExactSubstr-style shared-span report over the winnowing fingerprint
    * table: for each candidate pair, the number of shared fingerprints and
    * the GUARANTEED minimum length of shared text they certify. The
    * winnowing guarantee runs both directions — every shared substring of
    * >= w+k-1 tokens shares a fingerprint, and each shared fingerprint
    * certifies a shared k-token gram — so `min_shared_tokens = shared * k`
    * is a certified lower bound when selected grams don't overlap, and the
    * pair's smaller fingerprint count normalizes it into a containment
    * score (1.0 = every fingerprint of the smaller doc also in the larger:
    * likely full containment, the ExactSubstr removal trigger).
    *
    * Scale: reuses [[winnowNearDupCandidates]]'s join discipline — pair
    * work happens on the ~2/(w+1)-density fingerprint table with the
    * hot-fingerprint cap applied first, never on documents.
    */
  def dupSpans(docs: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 50): DataFrame = {
    // Barrier discipline (the winnowNearDupCandidates pattern, plus the
    // per-doc counts this variant needs): the pair table comes back
    // eagerly materialized and the counts table is barriered too, so the
    // big fingerprint barrier releases HERE — on failure as well (the
    // Verify driver catches per-query failures and continues; a
    // success-only release would strand the checkpoint blocks). The
    // small counts barrier passes to the returned frame.
    val fp = winnowingFingerprints(docs, k, w).barrier()
    var counts: DataFrame = null
    val pairs =
      try {
        counts = fp.groupBy(col("doc_id"))
          .agg(count_distinct(col("fingerprint")).as("nfp")).barrier()
        sharedFingerprintPairs(fp, minShared, maxDf)
      } catch {
        case t: Throwable =>
          if (counts != null) Barrier.release(counts)
          throw t
      } finally Barrier.release(fp)
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("nfp").as("nfp_a")),
        Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("nfp").as("nfp_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared") * k).as("min_shared_tokens"),
        Quant.r6(col("shared").cast("double") /
          least(col("nfp_a"), col("nfp_b")).cast("double"))
          .as("containment"))
  }

  /** TRUE ExactSubstr dedup analysis (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): for every document
    * pair, the EXACT maximal shared token spans of at least `minLen`
    * tokens — the stronger stage [[dupSpans]]'s winnowing bound
    * approximates. Output per pair: `n_spans` (maximal shared runs) and
    * `max_span` (tokens in the longest exact shared span).
    *
    * Construction (suffix-array equivalence, join-expressible): a shared
    * span of S >= minLen tokens is exactly a maximal run of S−minLen+1
    * consecutive shared minLen-gram anchors at a constant position offset
    * (the diagonal, pa − pb). So: hash every minLen-gram with its
    * position, join equal hashes across doc pairs, and run
    * gaps-and-islands per (pair, diagonal) — `pa − row_number()` is
    * constant within a consecutive run — to recover each maximal span
    * and its exact length. This reproduces what a suffix array reports
    * for cross-doc repeats >= minLen, in three relational steps any
    * engine (and the DuckDB oracle) executes identically; anchor
    * identity rides a 64-bit gram hash (collisions negligible; the
    * oracle joins md5 strings and agrees).
    *
    * Scale shape: the gram table is map-only off the token attribute; the
    * anchor join keys are 8-byte hashes, and a minLen-token exact match
    * is already near-dup-grade signal, so collisions are TRUE shared
    * spans, not trigram-style boilerplate noise — pair fan-out is
    * bounded by the corpus's real duplication (an f-sized exact-dup
    * cluster yields its true f² pairs). For corpora where even true
    * duplication explodes (mirror-heavy crawls), `maxGramDf` drops
    * grams with more than maxGramDf TOTAL occurrences first (total, not
    * distinct-doc frequency: the join cost per gram is occurrences², so
    * within-doc log-spam repetition blows up at df = 2) — the same
    * hot-key cap as [[winnowNearDupCandidates]]. Capped error model: a
    * span every one of whose anchors is hot disappears entirely; a RARE
    * span that merely CONTAINS a hot anchor fragments at it — n_spans
    * counts each fragment and the fragments overlap by up to minLen−1
    * tokens, so capped n_spans/span sums OVER-state fragmentation while
    * max_span under-states length (the removal half is immune:
    * [[exactSubstrClean]]'s interval-union fold clips overlaps before
    * counting). The island
    * window and both aggregations share one (doc_a, doc_b, diag)-prefixed
    * key, so the whole tail is a single exchange.
    */
  def exactSubstrSpans(docs: DataFrame, minLen: Int = 20,
      maxGramDf: Int = 0): DataFrame =
    substrIslands(docs, minLen, maxGramDf)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_spans"),
        max(col("span_len")).as("max_span"))

  /** Shared islands core of [[exactSubstrSpans]] / [[exactSubstrClean]]:
    * one row per maximal shared run — (doc_a, doc_b, diag, s_b = span
    * start in doc_b, span_len). See [[exactSubstrSpans]] for the
    * construction.
    */
  private def substrIslands(docs: DataFrame, minLen: Int,
      maxGramDf: Int): DataFrame = {
    // The winnowingFingerprints k-guard rule, applied to the gram
    // width: minLen = 0 makes every position's gram the EMPTY string
    // (one shared anchor key → an all-docs quadratic clique, and the
    // clean half would cut real text), and a negative minLen dies in
    // slice() mid-task with no operator context.
    require(minLen >= 1, s"minLen=$minLen must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    // Per-doc null-id rule (oracle-mirrored, the winnowingFingerprints
    // rationale): null-id grams can never anchor-join (doc_a < doc_b
    // rejects NULL) but DID count into the maxGramDf occurrence census.
    val toks = docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
    // (pos, gram-hash) structs; docs shorter than minLen contribute none.
    // (pos, gram) anchors via the codegen posGrams kernel (r18) — the
    // former transform(sequence, struct(concat_ws(slice))) evaluated
    // interpreted per position; < minLen tokens contribute none (the
    // kernel's own empty case, same as the old when-guard).
    val grams = toks.select(col("doc_id"),
      graft.functions.TextFunctions.posGrams(col("toks"), minLen).as("gs"))
    // Materialized before the self-join: the tokenize + minLen-gram
    // xxhash projection is the family's dominant map stage, and without
    // the checkpoint BOTH anchor-join sides (plus the df aggregation when
    // maxGramDf > 0) re-plan it — exchange reuse is a runtime maybe, not
    // a guarantee (see tfIdfTopTerms).
    // Anchor keys are TWO independent 64-bit hashes of the gram, joined
    // on both: a single xxhash64 is collision-credible at the 100 TB
    // target (~10^12 distinct minLen-grams -> ~10^4 expected cross-doc
    // 64-bit collisions, each fabricating a phantom minLen-token "shared
    // span" that exactSubstrClean would then CUT from a real document).
    // The gram string is built once in the lambda and hashed twice in
    // this codegen'd projection (strings never shuffle or checkpoint —
    // only the two longs do), so the added cost is one cheap hash.
    // The null guard sits on the exploded STRUCT, before hashing: Spark
    // hash functions SKIP null inputs and return the seed, so a filter
    // on the hash would keep every short-doc placeholder row on one
    // constant key (= an all-short-docs phantom clique in the join).
    val g0 = grams.select(col("doc_id"), explode_outer(col("gs")).as("g"))
      .where(col("g").isNotNull)
      .select(col("doc_id"), col("g.pos").as("pos"),
        xxhash64(col("g.gram")).as("gh"),
        xxhash64(lit("substr:b"), col("g.gram")).as("gh2"))
      .barrier()
    val g =
      if (maxGramDf <= 0) g0
      else {
        // The cap bounds TOTAL occurrences, not distinct-doc frequency:
        // the anchor join's cost per gram is (occurrences)^2, and two
        // log-spam docs repeating one gram 10^5 times each would join
        // 10^10 anchor rows while their distinct-doc df stayed 2 — a
        // df-based cap is blind to exactly the blowup it exists to stop.
        // One-sided undercount as documented (spans through a dropped
        // gram fragment); no broadcast hint — the hot set is bounded
        // only by corpus repetition, AQE broadcasts it when small.
        val hot = g0.groupBy(col("gh")).agg(count(lit(1)).as("occ"))
          .filter(col("occ") > maxGramDf).select(col("gh"))
        // Barrier the CAPPED table before it feeds both self-join sides
        // (the simhash/lshNearDups capped-table rule): unbarriered, the
        // occurrence aggregation + anti-join execute once PER SIDE. g0
        // is superseded once this materializes.
        // Release g0 on the capped materialization's FAILURE path too —
        // the corpus-sized gram checkpoint would otherwise strand for
        // the session (Verify catches per-query failures and continues).
        val capped =
          try g0.join(hot, Seq("gh"), "left_anti").barrier()
          catch { case t: Throwable => Barrier.release(g0); throw t }
        Barrier.release(g0)
        capped
      }
    val anchors = g.as("a").join(g.as("b"),
        col("a.gh") === col("b.gh") && col("a.gh2") === col("b.gh2") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"),
        (col("a.pos") - col("b.pos")).as("diag"))
    val w = W.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    anchors
      .withColumn("isl", col("pa") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("isl"))
      .agg(min(col("pb")).as("s_b"),
        (count(lit(1)) + (minLen - 1)).as("span_len"))
      .select(col("doc_a"), col("doc_b"), col("diag"),
        col("s_b"), col("span_len"))
  }

  /** The REMOVAL half of ExactSubstr (Lee et al. keep-one-occurrence):
    * every document's tokens covered by a span it shares with a
    * LOWER-id document are removed — the canonical (minimum-id) copy
    * keeps its text, later copies lose the duplicated spans — and the
    * cleaned corpus is reported as (n_tokens, removed_tokens,
    * kept_tokens, clean_hash), with clean_hash = md5 of the kept tokens
    * in original order (the paragraphDedupClean reporting convention:
    * hash-verifiable without shipping the rewritten text).
    *
    * Scale shape: the islands core is [[exactSubstrSpans]]'s; per-doc
    * removal intervals are a tiny aggregated table (bounded by real
    * duplication) hash-joined back to the corpus on doc_id; the clip /
    * filter runs as HOF folds over materialized attributes, map-side.
    * Overlapping intervals from different partners union correctly (the
    * fold clips; the exists-filter is a union membership test).
    */
  def exactSubstrClean(docs: DataFrame, minLen: Int = 20,
      maxGramDf: Int = 0): DataFrame = {
    val ivs = substrIslands(docs, minLen, maxGramDf)
      .select(col("doc_b").as("doc_id"), col("s_b").as("s"),
        (col("s_b") + col("span_len") - 1).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"))
    // Null-id docs drop from the cleaned report too (the family rule,
    // oracle-mirrored): they are no longer hashed by the islands core,
    // and a pass-through row under an un-joinable key is dead weight a
    // sink cannot attribute.
    val toks = docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val joined = toks.join(ivs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("ivs"),
          array().cast("array<struct<s:int,e:long>>")).as("ivs"))
    // Removed-token count: sorted-interval union walk (the
    // dupNgramCoverage clip fold — each covered token counted once).
    val covState = struct(lit(0L).as("end"), lit(0L).as("cnt"))
    val removed = aggregate(col("ivs"), covState,
      (st, iv) => {
        val s0 = greatest(iv("s").cast("long"), st("end") + 1L)
        val len = iv("e") - s0 + 1L
        struct(greatest(st("end"), iv("e")).as("end"),
          (st("cnt") + when(len > 0L, len).otherwise(0L)).as("cnt"))
      },
      st => st("cnt"))
    // Kept text: positions outside every interval, original order.
    val keptToks =
      when(size(col("toks")) === 0, array().cast("array<string>"))
        .otherwise(transform(
          filter(
            zip_with(col("toks"), sequence(lit(1), size(col("toks"))),
              (t, i) => struct(t.as("t"), i.as("i"))),
            p => !exists(col("ivs"),
              iv => p("i") >= iv("s") && p("i") <= iv("e"))),
          p => p("t")))
    joined
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        removed.as("removed_tokens"),
        (size(col("toks")).cast("long") - removed).as("kept_tokens"),
        md5(concat_ws(" ", keptToks)).as("clean_hash"))
  }

  /** Per-document top-`k` characteristic terms by rarity-weighted term
    * frequency — `score = tf · N / df` (N = corpus docs, df = docs
    * containing the term). This is tf-idf with a LINEAR 1/df rarity weight
    * instead of the usual log(N/df): every factor is integer-derived, so
    * the score is one exact IEEE division and bit-identical in any engine
    * (log() is only correct-to-1-ulp and would poison the hash compare);
    * the induced per-document ranking is what keyword extraction consumes.
    *
    * Scale shape: tf is one hash aggregation on (doc_id, token); df
    * re-aggregates THAT table (never the corpus) keyed on token; N arrives
    * as a broadcast 1-row join (no driver collect); the per-doc top-k is a
    * window row_number that Spark executes with WindowGroupLimit (per-
    * partition heaps, no full sort). Ties break lexicographically.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    // r18-cont rebalance (measured, sf0.1: 1.52 s cached vs 1.10 s this
    // shape): tf feeds the df aggregation AND the scoring join, but
    // persisting the corpus-sized (id, token, count) table cost more
    // than re-running the kernel tokenize+reduce once per consumer.
    // Barrier only the VOCAB-sized df table instead — and nothing
    // corpus-sized pins executors at 100 TB.
    // Null-id docs dropped up front, oracle-mirrored (the per-doc
    // family rule — the Search.postings frankendoc class): grouping
    // them under the NULL key would merge every null-id doc into one
    // ranked pseudo-doc whose tokens inflate df while count_distinct
    // counts them as ZERO docs — a corpus-wide score skew.
    val idDocs = docs.where(col("doc_id").isNotNull)
    val tf = explodedTokens(idDocs)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = Barrier(
      tf.groupBy(col("token")).agg(count(lit(1)).as("df")))
    try {
      val n = idDocs.agg(count_distinct(col("doc_id")).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token").asc)
      tf.join(df, Seq("token"))
        .join(broadcast(n))
        // Multiply in DOUBLE (value-identical below 2^53): the long
        // product tf·N wraps — ANSI: throws — at the BM25 rank-sum
        // scale (~1e11 docs × tf ~1e8), exactly the class Search
        // widened to decimal.
        .withColumn("score",
          (col("tf").cast("double") * col("n").cast("double"))
            / col("df").cast("double"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          col("score"), col("rank").cast("long").as("rank"))
        .barrier() // materialize before releasing the df barrier
    } finally Barrier.release(df)
  }
}
