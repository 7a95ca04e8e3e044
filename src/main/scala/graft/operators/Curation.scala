package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Barrier.BarrierOps

/** Corpus-curation operators for the `documents` table — the
  * filter/sample/mix stages of a training-data pipeline (BASELINE.json
  * north star), downstream of the dedup suite in [[Dedup]] and the scoring
  * suite in [[TextAnalysis]].
  *
  * Everything is a pure `Column` expression (whole-stage codegen, no UDFs)
  * and re-computable in ANSI SQL, so the DuckDB oracle verifies each stage
  * exactly — including the hash-based sampler, which draws its randomness
  * from md5 (bit-identical in any engine) rather than an RNG.
  *
  * Scale design: the rule filter and the sampler are map-only (no shuffle;
  * the parquet scan prunes to the referenced columns). The mix report is
  * one partial-aggregated groupBy over (source, lang) — thousands of
  * groups at most — with the corpus total window-summed over those cells.
  */
object Curation {

  /** Gopher-style heuristic quality rules (Rae et al. 2021, "Scaling
    * Language Models" appendix A1.1): per-document flags plus the composite
    * `keep` verdict. The rule *shape* follows the paper — word-count
    * bounds, mean-word-length bounds, a distinct-word test, a stopword
    * test, and the REPETITION section (duplicate-line fraction + most-
    * frequent-2-gram character share — the rules that actually catch
    * boilerplate) — with thresholds parameterized (defaults tuned so the
    * synthetic corpus splits rather than collapsing to all-pass/all-fail).
    *
    * Repetition details (single-line corpus adaptations, both documented
    * deviations from newline splitting):
    *  - "lines" are fixed 10-token chunks (same unit as
    *    [[TextAnalysis.paragraphDedup]]); `dup_line_fraction` = chunks
    *    minus distinct chunks over chunks.
    *  - `top_2gram_share` = occurrences(top 2-gram) × chars(top 2-gram) /
    *    chars(text); the top 2-gram is found by a sorted-array run-length
    *    fold (strict `>` ⇒ ties resolve to the lexicographically smallest
    *    gram), entirely map-side — no per-doc explode+shuffle.
    *
    * Everything stays one map-only projection chain over a single corpus
    * scan; `keep` is computed on the UNROUNDED ratios in both engines; the
    * emitted ratio columns are rounded to 6 dp for cross-engine hashing.
    */
  // "a" included deliberately: a stopword list must reflect the corpus's
  // actual function words, and without it the synthetic corpus (articles
  // "the"/"a" only) can never reach minStopHits — the rule silently
  // all-fails instead of discriminating (caught by the curationReport
  // pass-rate audit).
  val gopherStopwords: Seq[String] =
    Seq("the", "a", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher rule defaults — the ONE source both entry points read, so a
    * threshold retune cannot drift between the public operator and the
    * pre-tokenized path curationReport shares (the oracle hash turns red
    * on an asymmetric retune, but the constants remove the drift channel
    * entirely).
    */
  private[graft] object GopherDefaults {
    val MinWords = 40; val MaxWords = 100000
    val MinMeanLen = 3.0; val MaxMeanLen = 10.0
    val MinDistinctRatio = 0.4; val MinStopHits = 2
    val MaxDupLineFraction = 0.3; val MaxTop2GramShare = 0.2
    val MaxTop3GramShare = 0.18; val MaxTop4GramShare = 0.16
    val ChunkTokens = 10
  }
  import GopherDefaults._

  def gopherQuality(docs: DataFrame,
      minWords: Int = MinWords, maxWords: Int = MaxWords,
      minMeanLen: Double = MinMeanLen, maxMeanLen: Double = MaxMeanLen,
      minDistinctRatio: Double = MinDistinctRatio,
      minStopHits: Int = MinStopHits,
      maxDupLineFraction: Double = MaxDupLineFraction,
      maxTop2GramShare: Double = MaxTop2GramShare,
      maxTop3GramShare: Double = MaxTop3GramShare,
      maxTop4GramShare: Double = MaxTop4GramShare,
      chunkTokens: Int = ChunkTokens): DataFrame =
    // Materialize the token array once (attribute, not inline expression):
    // the interpreted HOF path re-evaluates a lambda's free subexpressions
    // per element (see Dedup.shinglesFromTokens).
    gopherQualityFromTokens(
      docs.select(col("doc_id"), length(col("text")).as("chars"),
        TextAnalysis.wsTokens(col("text")).as("toks")),
      minWords, maxWords, minMeanLen, maxMeanLen, minDistinctRatio,
      minStopHits, maxDupLineFraction, maxTop2GramShare, maxTop3GramShare,
      maxTop4GramShare, chunkTokens)

  /** [[gopherQuality]] over a PRE-TOKENIZED table (`doc_id`, `chars`,
    * `toks` attributes; extra columns ignored) — the entry point
    * [[curationReport]] uses so all its stages share one tokenization of
    * the corpus instead of re-running the regex split per stage. Both
    * signatures default from [[GopherDefaults]] — one retune point.
    */
  private[graft] def gopherQualityFromTokens(toks: DataFrame,
      minWords: Int = MinWords, maxWords: Int = MaxWords,
      minMeanLen: Double = MinMeanLen, maxMeanLen: Double = MaxMeanLen,
      minDistinctRatio: Double = MinDistinctRatio,
      minStopHits: Int = MinStopHits,
      maxDupLineFraction: Double = MaxDupLineFraction,
      maxTop2GramShare: Double = MaxTop2GramShare,
      maxTop3GramShare: Double = MaxTop3GramShare,
      maxTop4GramShare: Double = MaxTop4GramShare,
      chunkTokens: Int = ChunkTokens): DataFrame = {
    // The three top-n-gram pipelines and the stopword scan run as native
    // codegen kernels (graft.functions.{TopNgram, StopwordHits}) — the
    // former sort_array + aggregate-fold + transform(lower) +
    // chunk-transform HOF chains evaluated interpreted per element and
    // dominated this operator's single map job (equivalence spec-pinned
    // expression-by-expression; the run-length semantics — strict >
    // keeps the FIRST = smallest max gram, matching the oracle's ORDER
    // BY count DESC, gram ASC tie-break — live in the kernel's contract
    // now). The chunk unit stays chunkStructs' definition — the
    // DupChunkStats kernel replicates it and the equivalence spec pins
    // the two against each other, so a chunking change trips a test
    // instead of silently diverging from paragraphDedup's unit.
    // Case-insensitive distinct-stopword count (Rae et al. case-fold):
    // an all-caps/title-cased document would otherwise score
    // stop_hits = 0 and fail `keep` regardless of quality.
    val stopHits =
      graft.functions.TextFunctions.stopwordHits(col("toks"), gopherStopwords)
    val chunkStats =
      graft.functions.TextFunctions.dupChunkStats(col("toks"), chunkTokens)
    val m = toks.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("word_count"),
      // The SHARED mean-token-length kernel, not a hand-synced copy of
      // the fold (TextAnalysis.meanTokenLenFromToks).
      TextAnalysis.meanTokenLenFromToks(col("toks")).as("mwl"),
      when(size(col("toks")) === 0, 0.0).otherwise(
        size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("dr"),
      stopHits.cast("long").as("stop_hits"),
      // The empty-doc guard is unchanged (chunkStructs' zero-length
      // pseudo-chunk would make dlf 0/1 = the same 0.0 the guard
      // yields).
      when(size(col("toks")) === 0, 0.0).otherwise(
        (chunkStats("n_chunks") - chunkStats("n_distinct")).cast("double") /
          chunkStats("n_chunks").cast("double")).as("dlf"),
      graft.functions.TextFunctions.topNgram(col("toks"), 2).as("top2"),
      graft.functions.TextFunctions.topNgram(col("toks"), 3).as("top3"),
      graft.functions.TextFunctions.topNgram(col("toks"), 4).as("top4"),
      col("chars"))
    def share(top: String): Column =
      when(col("chars") === 0 || col(top)("best") === 0L, 0.0)
        .otherwise(col(top)("best").cast("double") *
          length(col(top)("bestg")).cast("double") / col("chars").cast("double"))
    // floor-quantized to the 1e-6 grid, NOT round() — the shared
    // Quant.q6 discipline (one definition, no per-operator copies).
    def q6(c: Column): Column = Quant.q6(c)
    m.select(
      col("doc_id"),
      col("word_count"),
      q6(col("mwl")).as("mean_word_len"),
      q6(col("dr")).as("distinct_ratio"),
      col("stop_hits"),
      q6(col("dlf")).as("dup_line_fraction"),
      col("top2")("bestg").as("top_2gram"),
      q6(share("top2")).as("top_2gram_share"),
      q6(share("top3")).as("top_3gram_share"),
      q6(share("top4")).as("top_4gram_share"),
      (col("word_count").between(minWords, maxWords) &&
        col("mwl").between(minMeanLen, maxMeanLen) &&
        col("dr") >= minDistinctRatio &&
        col("stop_hits") >= minStopHits &&
        col("dlf") <= maxDupLineFraction &&
        share("top2") <= maxTop2GramShare &&
        share("top3") <= maxTop3GramShare &&
        share("top4") <= maxTop4GramShare).as("keep"))
  }

  /** A line must carry at least this many whitespace words to survive the
    * C4 line filter (Raffel et al. 2020 §2.2: "only retained lines that
    * ... contained at least 5 words").
    */
  val C4MinLineWords: Int = 5

  /** A page must keep at least this many lines to survive the C4 page
    * filter (the paper discards pages with fewer than 3 sentences; this
    * adaptation counts SURVIVING lines, the unit the line filter already
    * established).
    */
  val C4MinKeptLines: Int = 3

  /** C4-style line-level cleanup (Raffel et al. 2020 §2.2 — the public
    * C4 heuristics, the complement to [[gopherQuality]]'s page-level
    * statistics): a LINE survives iff, after trimming, it ends in
    * terminal punctuation (`.`/`!`/`?`/`"`), carries at least
    * [[C4MinLineWords]] whitespace words, and does not mention
    * "javascript" (case-folded); a PAGE survives iff at least
    * [[C4MinKeptLines]] lines survive and the raw text contains neither
    * "lorem ipsum" (case-folded) nor an OPENING curly brace ('{' only — the code signal; a lone '}' passes, C4-paper fidelity). Output per document:
    * the line counts, the page flags, the composite verdict, and the md5
    * of the cleaned text (surviving lines re-joined with newlines) so
    * the reconstruction itself is hash-verified.
    *
    * Omitted C4 stages, deliberately: the bad-words list (a specific
    * blocklist artifact, not an algorithm) and the three-sentence-span
    * dedup (subsumed by [[TextAnalysis.exactSubstrSpans]], the stronger
    * suffix-style form).
    *
    * Scale shape: map-only — the line split and every rule are per-row
    * array folds (HOF `filter` over the split, no explode, no exchange
    * anywhere; plan-locked). At 100 TB this runs at scan speed alongside
    * the other page gates (gopher/quality/pii), exactly how C4 ran it.
    */
  def c4Rules(docs: DataFrame): DataFrame = {
    val text = coalesce(col("text"), lit(""))
    // Projection-barrier discipline (the gopherQuality rule): HOF
    // lambdas run interpreted, and an inline `val t = trim(l)` is a
    // Column TREE duplicated into all three rule tests — trim executed
    // 3× per line of the corpus. Each derived array materializes as its
    // own attribute instead (CollapseProject keeps multi-referenced
    // non-cheap aliases out of line), with the (line, trimmed) pair
    // zipped so the tests read the trimmed form while the kept array —
    // and therefore clean_md5 — keeps the ORIGINAL line verbatim.
    val staged = docs
      .select(col("doc_id"), text.as("__t"),
        // \r?\n: a CRLF corpus must split to \r-free lines, or every
        // rule downstream (the last-char test, the word count, the
        // rebuilt clean text) silently treats the \r as content.
        split(text, "\r?\n").as("__lines"))
      .select(col("doc_id"), col("__t"), col("__lines"),
        zip_with(col("__lines"), transform(col("__lines"), l => trim(l)),
          (l, t) => struct(l.as("l"), t.as("t"))).as("__zl"))
      .select(col("doc_id"), col("__t"), col("__lines"),
        transform(
          filter(col("__zl"), s => {
            val t = s("t")
            // Last-char set test, NOT a `$`-anchored regex: Java's `$`
            // matches BEFORE a final line terminator while RE2's is
            // end-of-text, so a CRLF corpus (lines ending "\r" after the
            // \n split) would keep the line here and drop it in the
            // oracle. substring(-1) has one cross-engine meaning.
            substring(t, -1, 1).isin(".", "!", "?", "\"") &&
              // DELIBERATELY not tokenCountWs: `t` is the pre-trimmed
              // line attribute (the round-13 HOF fix), and wsTokens
              // would re-run trim per line inside this interpreted
              // lambda; the inline form is value-identical on trimmed
              // input (blank → 0 both ways).
              size(filter(split(t, "\\s+"), w => w =!= lit(""))) >=
                C4MinLineWords &&
              !lower(t).contains("javascript")
          }),
          s => s("l")).as("__kept"))
    val nKept = size(col("__kept")).cast("long")
    val hasLorem = lower(col("__t")).contains("lorem ipsum")
    val hasBrace = col("__t").contains("{")
    staged.select(
      col("doc_id"),
      size(col("__lines")).cast("long").as("n_lines"),
      nKept.as("n_kept"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (nKept >= C4MinKeptLines && !hasLorem && !hasBrace).as("page_keep"),
      md5(array_join(col("__kept"), "\n")).as("clean_md5"))
  }

  /** Deterministic stratified sampling: keep a document iff the first two
    * hex chars of md5("sample:" + doc_id) sort below the stratum's
    * threshold — a seeded per-row coin with 1/256 rate resolution that any
    * engine reproduces exactly (no RNG, no state). The per-language rates
    * are the training-mix knob (e.g. downsample the over-represented
    * head language); `defaultRate` covers unlisted strata.
    *
    * At 100 TB this is THE sampling shape that works: embarrassingly
    * parallel, no global count pass, no sort, stable under re-runs and
    * late-arriving partitions.
    */
  def stratifiedSample(docs: DataFrame,
      rates: Map[String, Double] = Map("en" -> 0.5, "zh" -> 0.125),
      defaultRate: Double = 0.25): DataFrame =
    docs.filter(sampleKeep(rates, defaultRate))
      .select(col("doc_id"), col("lang"), col("source"))

  /** Fixed-SIZE uniform sample — the exactly-k companion to the
    * rate-based [[stratifiedSample]] (a rate coin yields a BINOMIAL
    * sample size; eval-set construction and budget-bounded audits need
    * exactly k): every document draws a deterministic md5 coin and the k
    * smallest coins win — the classic distributed reservoir-sample
    * equivalent (order-statistics of iid uniforms), but reproducible
    * and engine-portable since the "uniforms" are md5 values both
    * engines compute bit-identically.
    *
    * Scale (100 TB): plans as TakeOrderedAndProject — per-partition
    * top-k then one k-row merge on the driver side of the exchange,
    * never a global sort (plan-locked). Changing `seed` redraws the
    * sample; doc_id tie-break keeps even a coin collision
    * deterministic.
    */
  def uniformSample(docs: DataFrame, k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"sample size k=$k must be positive")
    // NULL doc_id rows draw a NULL coin, which sorts FIRST under asc
    // nulls-first — they would deterministically occupy sample slots
    // (k=5 with 3 null-id rows = 2 real documents). An unidentifiable
    // row is not sampleable; drop up front (oracle mirrors).
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"),
        md5(concat(lit(s"us:$seed:"), col("doc_id").cast("string")))
          .as("coin"))
      .orderBy(col("coin"), col("doc_id"))
      .limit(k)
  }

  /** WEIGHTED priority sample — the importance-weighted companion to
    * [[uniformSample]] (exactly-k where a document's inclusion odds scale
    * with a per-document weight: length-proportional eval draws,
    * quality-tilted audit sets). Each document draws a uniform 60-bit
    * integer coin (15 md5 hex chars — the [[TextAnalysis]] gram-hash
    * width) and a PRIORITY = `coin DIV weight`; the k smallest
    * priorities win. Doubling a weight halves the expected priority and
    * — for weights far below the 2^60 coin range — doubles the inclusion
    * odds: the classic priority-sampling scheme (Duffield et al.), made
    * hash-reproducible. Integer coin, integer floor division, no floats:
    * same seed + corpus ⇒ the same sample on any engine, exactly.
    *
    * Rows with NULL doc_id (no identity — [[uniformSample]]'s rule) or
    * NULL/non-positive weight (no mass; would also divide by zero) are
    * not sampleable and are dropped up front; the oracle mirrors both.
    *
    * Scale (100 TB): TakeOrderedAndProject — per-partition top-k, k-row
    * driver-side merge, never a global sort (plan-locked with
    * [[uniformSample]]).
    */
  def weightedSample(docs: DataFrame, k: Int, weight: Column,
      seed: Long = 0L): DataFrame = {
    require(k >= 1, s"sample size k=$k must be positive")
    // A fractional weight column (quality scores live in [0, 1] here)
    // would TRUNCATE to 0 under a bare long cast, and the non-positive-
    // weight guard below would then return an EMPTY sample with no error.
    // Scale fractional weights to integer micro-units first (IEEE
    // multiply + floor — deterministic, so the draw stays reproducible).
    // (FractionalType itself is private[sql] in Spark 4 — enumerate.)
    import org.apache.spark.sql.types.{DoubleType, FloatType, DecimalType}
    val w = docs.select(weight.as("__w")).schema.head.dataType match {
      // Scale-0 decimals are exact integers (the decimal(38,0) wide-sum
      // type this codebase produces): keep them on the exact long path —
      // the 1e6 scaling would overflow the long cast past ~9.2e12 and
      // lose precision through the double multiply past 2^53, for a
      // column that never needed fractional handling.
      case d: DecimalType if d.scale == 0 => weight.cast("long")
      case DoubleType | FloatType | _: DecimalType =>
        // A positive weight below 1e-6 still floors to 0 after scaling —
        // and the weight > 0 guard below would then silently exclude a
        // row the caller gave positive mass. Fail loudly instead: the
        // caller either rescales their weights or pre-filters the
        // sub-micro tail deliberately.
        val scaled = floor(weight * lit(1e6)).cast("long")
        // Non-finite weights fail HERE with operator context: NaN skips
        // the sub-micro arm (NaN > 0 is false) and +Infinity skips it
        // too, and both would otherwise die as a contextless ANSI
        // CAST_INVALID_INPUT / CAST_OVERFLOW deep in a task — or, on a
        // non-ANSI session, silently drop the row as NULL. (0/0 on
        // doubles is IEEE NaN, not an error — the sourceMix hazard.)
        when(isnan(weight) || weight === lit(Double.PositiveInfinity) ||
            weight === lit(Double.NegativeInfinity),
          raise_error(lit("weightedSample: non-finite weight (NaN or " +
            "Infinity) — clean the weight column upstream")))
          .when(weight > lit(0) && scaled <= lit(0L),
            raise_error(lit("weightedSample: positive weight below 1e-6 " +
              "floors to zero mass after micro-unit scaling — rescale the " +
              "weight column or filter sub-micro weights explicitly")))
          .otherwise(scaled)
      case _ => weight.cast("long")
    }
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"), w.as("weight"),
        conv(substring(md5(concat(lit(s"ws:$seed:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("__coin"))
      .where(col("weight").isNotNull && col("weight") > 0)
      .select(col("doc_id"), col("weight"),
        expr("__coin DIV weight").as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }

  /** The sampling coin as a reusable boolean Column over (`doc_id`,
    * `lang`) attributes — [[stratifiedSample]] filters on it;
    * [[curationReport]] emits it as the `s_keep` audit flag without a
    * join against the filtered output.
    */
  // "zz" sorts above every hex coin, so any rate that ROUNDS to 256/256
  // keeps ALL rows — capping at 255 would quantize rates in [0.998, 1)
  // down to 255/256 and wrongly drop coin == "ff", a larger error than
  // the advertised 1/256 resolution. Shared with Dedup.splitAssign so
  // the split-boundary arithmetic can never drift from the sampling
  // coin's.
  private[graft] def hexThreshold(rate: Double): String = {
    val steps = math.max(0L, math.round(rate * 256))
    if (steps >= 256) "zz" else f"$steps%02x"
  }

  private[graft] def sampleKeep(rates: Map[String, Double],
      defaultRate: Double): Column = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (lang, rate)) =>
        when(col("lang") === lang, lit(hexThreshold(rate))).otherwise(acc)
    }
    substring(md5(concat(lit("sample:"), col("doc_id").cast("string"))), 1, 2) <
      threshold
  }

  /** Training-mix report: per (source, lang) document and whitespace-token
    * counts plus each cell's share of total corpus tokens — the table a
    * data-mixing stage reads to set sampling weights. The share divides two
    * exact integers, so the double is bit-identical cross-engine.
    */
  def sourceMix(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(col("source"), col("lang"),
      TextAnalysis.tokenCountWs(col("text")).cast("long").as("toks"))
    // Materialized once: the total branch below re-aggregates the CELLS
    // (sources × langs — tiny), never the raw corpus; without the
    // checkpoint both plan branches would re-scan the 100 TB input.
    val cells = perDoc.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"))
      .barrier()
    // Corpus total as a broadcast 1-row cross join over the aggregated
    // cells — same arithmetic as an unpartitioned window but without
    // WindowExec's single-partition pass (and its "No Partition Defined"
    // warning on every run).
    val total = cells.agg(sum(col("tokens")).as("__total"))
    // floor-quantized, not round: integer-ratio shares CAN land exactly
    // on the .5 rounding grid (tokens=1, total=2e6 → 5e-7), where
    // round()'s decimal-vs-binary tie handling is engine-dependent;
    // floor of an IEEE double is unambiguous (same rule as mixRatePlan).
    cells.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("docs"), col("tokens"),
        // Zero-total guard: on an all-tokenless corpus 0/0 is NaN (IEEE
        // double division, not an ANSI error) and a NaN share would
        // propagate into every consumer's arithmetic — report 0 like
        // temperatureMixPlan does on the same degenerate input. Real
        // corpora always have total > 0, so the oracle's plain divide
        // stays value-identical.
        when(col("__total") > 0L,
          Quant.q6(col("tokens").cast("double") /
            col("__total").cast("double"))).otherwise(lit(0.0))
          .as("token_share"))
  }

  /** The per-language (docs, tokens) cells BOTH planners aggregate —
    * one corpus scan collapsed to dozens of rows and BARRIERED, because
    * every consumer feeds several plan branches from it (without the
    * materialization each branch would re-scan the 100 TB input). ONE
    * definition so the planners' token arithmetic cannot drift from
    * each other.
    */
  private def langTokenCells(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"))
      .barrier()

  /** Mix-rate PLANNER — the step between [[sourceMix]]'s report and
    * [[stratifiedSample]]'s knob: given target token shares per language,
    * compute the per-language downsampling rates that achieve them.
    * `rate_l ∝ target_l / current_share_l`, normalized so the binding
    * (most under-represented relative to its target) language keeps
    * everything (rate 1.0) and every other language downsamples to match
    * — the downsample-only mixing recipe (no upsampling/duplication).
    * Expected post-sample shares then equal the targets exactly (up to
    * the coin's 1/256 resolution when fed to [[stratifiedSample]]).
    *
    * Determinism: shares are integer-ratio doubles; the emitted
    * `token_share`/`sample_rate` are floor-quantized at 1e-6 (floor of
    * an IEEE double is unambiguous cross-engine; round at .5 is not).
    * A zero-token language gets rate 0 (nothing to keep), as does any
    * language not in `targets` when `defaultTarget` = 0 — dropping
    * unlisted languages is the usual cleanup semantic.
    *
    * Scale shape: one map-side-combined aggregation to language cells
    * (dozens of rows); total and the normalizing max ride broadcast
    * 1-row cross joins — the corpus is scanned once.
    */
  def mixRatePlan(docs: DataFrame, targets: Map[String, Double],
      defaultTarget: Double = 0.0): DataFrame = {
    // Knob validation, driver-side and loud (the weightedSample /
    // sourceCaps rule): a NaN or negative target share would otherwise
    // propagate silently — NaN poisons max(__ratio) under Spark's
    // NaN-greater-than-everything ordering and every sample_rate emits
    // NaN with no error anywhere.
    (targets.toSeq :+ ("defaultTarget" -> defaultTarget)).foreach {
      case (l, t) =>
        require(!t.isNaN && !t.isInfinite && t >= 0.0,
          s"mixRatePlan: target share for '$l' is $t — shares must be " +
            "finite and >= 0")
    }
    // Shared cells kernel — feeds the total + max + output branches.
    val cells = langTokenCells(docs)
    val total = cells.agg(sum(col("tokens")).as("__total"))
    val tgt = targets.foldLeft(lit(defaultTarget)) { case (acc, (l, t)) =>
      when(col("lang") === l, lit(t)).otherwise(acc)
    }
    val withT = cells.crossJoin(broadcast(total))
      // Zero-total guard — the sourceMix rule: 0/0 is NaN, not an error,
      // and every share being NaN would make __ratio/__mx NaN too; a
      // zero-token corpus plans rate 0 everywhere instead.
      .withColumn("__share",
        when(col("__total") > 0L,
          col("tokens").cast("double") / col("__total").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("target_share", tgt)
      .withColumn("__ratio",
        when(col("tokens") === 0L, lit(0.0))
          .otherwise(col("target_share") / col("__share")))
    val mx = withT.agg(max(col("__ratio")).as("__mx"))
    def q6(c: Column): Column = Quant.q6(c)
    withT.crossJoin(broadcast(mx))
      .select(col("lang"), col("docs"), col("tokens"),
        q6(col("__share")).as("token_share"),
        col("target_share"),
        when(col("__mx") === 0.0, lit(0.0))
          .otherwise(q6(col("__ratio") / col("__mx"))).as("sample_rate"))
  }

  /** Temperature-flattened mix planner — the UniMax-style alternative to
    * [[mixRatePlan]]'s explicit targets: flatten the natural language
    * distribution toward uniform with temperature `tau` (target share
    * ∝ share^(1/tau)) and emit the downsample-only rates that achieve it.
    *
    * The head-language rate falls out in closed form with NO cross-language
    * sum: target'_l ∝ p_l^(1/tau) ⇒ unnormalized rate ∝ p_l^(1/tau−1),
    * which is maximal at the SMALLEST language, so after normalizing the
    * binding (smallest) language to rate 1.0 the global normalizer cancels:
    * `rate_l = (tokens_min / tokens_l)^(1 − 1/tau)`. That matters for
    * determinism: a sum of per-language doubles is aggregation-order-
    * dependent; a two-integer ratio under one root is not.
    *
    * Determinism contract: exact for `tau = 2` (the ratio is an exact
    * integer rational → one IEEE division, and `sqrt` is correctly rounded
    * by IEEE 754 in every engine) and for `tau = ∞` (pure ratio — full
    * UniMax uniform). Other `tau` route through `pow`, which libm does NOT
    * guarantee bit-identical cross-engine — fine for production use, not
    * for hash-compared oracles; the registered query pins tau = 2.
    * `sampled_tokens` multiplies the integer token count by the ALREADY
    * QUANTIZED rate (one IEEE multiply) before flooring, so it inherits
    * the determinism.
    *
    * Scale shape: one map-side-combined aggregation to language cells
    * (dozens of rows); the min rides a broadcast 1-row cross join — the
    * corpus is scanned once, same as [[mixRatePlan]].
    */
  def temperatureMixPlan(docs: DataFrame, tau: Double = 2.0): DataFrame = {
    // tau > 1.0 already admits +Inf; an explicit isInfinity clause would
    // also admit -Inf, which the message forbids.
    require(tau > 1.0,
      s"tau must exceed 1 (got $tau): tau<=1 would UPsample the head")
    // Shared cells kernel — feeds the min branch AND the output select.
    val cells = langTokenCells(docs)
    val mn = cells.agg(min(when(col("tokens") > 0L, col("tokens"))).as("__mn"))
    val ratio = col("__mn").cast("double") / col("tokens").cast("double")
    val rate =
      if (tau == 2.0) sqrt(ratio)
      else if (tau.isInfinity) ratio
      else pow(ratio, lit(1.0 - 1.0 / tau))
    val qRate = when(col("tokens") === 0L || col("__mn").isNull, lit(0.0))
      .otherwise(Quant.q6(rate))
    cells.crossJoin(broadcast(mn))
      .select(col("lang"), col("docs"), col("tokens"),
        qRate.as("sample_rate"),
        floor(col("tokens").cast("double") * qRate).cast("long")
          .as("sampled_tokens"))
  }

  /** Deterministic sequence-packing assignment: within each language,
    * documents are laid out in doc_id order and cut into packs of
    * `budgetTokens` whitespace tokens — `pack_id = floor(tokens-before /
    * budget)`, so a document lands in the pack where its first token
    * falls (packs may overflow by one document; none underflow).
    *
    * Scale shape — range-partitioned two-pass (NOT one window per
    * language, which would sort the head language's whole corpus on a
    * single task):
    *  1. per-(lang, doc_id-range) token totals — an ordinary map-side-
    *     combined aggregation, one row per range;
    *  2. cumulative range offsets via a window over that TINY totals
    *     table (rows = langs × ranges), broadcast back;
    *  3. the running sum inside each range — a window partitioned by
    *     (lang, range), so parallelism = number of ranges, and each sort
    *     is bounded by `rangeSize` rows.
    * `before = range_offset + within_range_before` reproduces the global
    * per-language running sum exactly (doc_id ranges are contiguous), so
    * the output is bit-identical to the single-window form the oracle
    * computes. The corpus is scanned twice (totals + windows) — the
    * standard trade for unbounded window parallelism.
    */
  def packAssignments(docs: DataFrame, budgetTokens: Long = 2048L,
      // Output is INVARIANT in rangeSize (ranges only bound per-window
      // task size); the default keeps the offsets table driver/broadcast-
      // tiny at corpus scale: 1e9 docs → 1e4 offset rows. Smaller values
      // buy nothing but a bigger broadcast. NB the range key is doc_id
      // MAGNITUDE (doc_id DIV rangeSize), so the tiny-offsets argument
      // assumes reasonably DENSE ids — snowflake/hash-style sparse
      // 63-bit ids put ~one doc per range and grow the offsets table
      // toward corpus size; re-key such a corpus (or raise rangeSize to
      // the id spacing) before packing.
      rangeSize: Long = 100000L,
      // The budget's unit: whitespace tokens by default; pass
      // TextAnalysis.tokenCountBpe to budget in the subword-ish units a
      // trainer actually consumes (same plan shape either way).
      tokenCount: Column => Column = TextAnalysis.tokenCountWs,
      // carryText = true rides the text column THROUGH the running-sum
      // window exchange, for consumers that need (assignment, text)
      // together ([[writeShards]]): the window's (lang, __rng) exchange
      // has to move those rows anyway, so carrying text there replaces a
      // corpus-sized doc_id sort-merge re-join (one full extra sort of
      // the text column) with zero additional exchanges. The totals
      // branch is untouched — column pruning keeps text out of its
      // aggregation shuffle. Default false: assignment-only output, the
      // shape every oracle replays.
      carryText: Boolean = false): DataFrame = {
    // Driver-side requires (the sampleFrames rule): a zero budget or
    // range would otherwise surface executor-side — ANSI CAST_OVERFLOW
    // on floor(x/0.0)=Inf after task retries, or silent garbage pack
    // ids without ANSI.
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be positive")
    require(rangeSize > 0, s"rangeSize=$rangeSize must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val baseCols = Seq(col("doc_id"), col("lang"),
      tokenCount(col("text")).cast("long").as("toks")) ++
      (if (carryText) Seq(col("text")) else Nil)
    // Null-id docs dropped up front, oracle-mirrored (the family rule —
    // supersedes the earlier keep-via-<=> choice): packing order is the
    // OUTPUT here, and doc_id is its sort key, so null-id rows were
    // doubly broken — Spark orders NULLS FIRST where the oracle's window
    // orders them LAST (every real doc's running offset shifts), and two
    // null-id rows TIE in the within-range window, making their pack ids
    // (and the written shard contents) shuffle-order nondeterministic.
    // A doc without identity cannot be placed deterministically in an
    // identity-ordered layout. The lang <=> below still matters (a NULL
    // LANG is a legitimate packing group).
    val base = docs.where(col("doc_id").isNotNull).select(baseCols: _*)
      // Exact integer floor (the RangeJoin rule): floor(long/long) via
      // DOUBLE division is exact only below 2^53; subtracting the
      // always->=0 pmod makes the dividend exactly divisible, so DIV —
      // integral and sign-safe — equals floor at every magnitude.
      .withColumn("__rng",
        expr(s"(doc_id - pmod(doc_id, ${rangeSize}L)) DIV ${rangeSize}L"))
    val totals = base.groupBy(col("lang"), col("__rng"))
      .agg(sum(col("toks")).as("__rtot"))
    val wOff = W.partitionBy(col("lang")).orderBy(col("__rng"))
      .rowsBetween(W.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__roff", coalesce(sum(col("__rtot")).over(wOff), lit(0L)))
      .select(col("lang"), col("__rng"), col("__roff"))
    val wIn = W.partitionBy(col("lang"), col("__rng")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    // Null-safe on lang: a NULL-lang doc forms its own group in totals
    // and the windows (both treat NULL as a key), but a plain equi-join
    // would never match it back to its offset row and the doc would
    // silently vanish from the packing — and thus from the written
    // shards. <=> keeps the row-loss impossible.
    val off = offsets
      .withColumnRenamed("lang", "__olang").withColumnRenamed("__rng", "__orng")
    base
      .withColumn("__wb", coalesce(sum(col("toks")).over(wIn), lit(0L)))
      .join(broadcast(off),
        // <=> on BOTH keys: __rng derives from doc_id, so a dirty-ingest
        // NULL doc_id groups its totals/offsets under the NULL range key
        // — a plain === would never match it back and the row would
        // silently vanish from packing (the exact row-loss the lang <=>
        // fixed, one key over).
        col("lang") <=> col("__olang") && col("__rng") <=> col("__orng"))
      .select(Seq(col("doc_id"), col("lang"), col("toks"),
        // Non-negative dividend (token sums), so integral DIV == floor —
        // exact at every magnitude where the old floor(double) was exact
        // only below 2^53 (the oracle moved to // in the same change).
        expr(s"(__wb + __roff) DIV ${budgetTokens}L").as("pack_id")) ++
        (if (carryText) Seq(col("text")) else Nil): _*)
  }

  /** Shard manifest — the step after [[packAssignments]] that lays packs
    * out into output shards: within each language, `packsPerShard`
    * consecutive packs form one shard (`shard_id = floor(pack_id /
    * packsPerShard)` — contiguous doc_id ranges, so a shard is one
    * sequential read of the packed corpus), and the manifest reports each
    * shard's pack/document/token totals. This is the table a training
    * job's data loader consumes to size and schedule shard reads.
    *
    * Scale shape: inherits the range-partitioned packing pass; the
    * manifest aggregation is one groupBy over (lang, shard) — thousands
    * of cells — with map-side combine.
    */
  def shardManifest(docs: DataFrame, budgetTokens: Long = 2048L,
      // Same output-invariant default as packAssignments/writeShards —
      // the three siblings must agree (broadcast-size rationale there).
      packsPerShard: Long = 4L, rangeSize: Long = 100000L,
      // The budget unit knob, plumbed through to packAssignments — a
      // BPE-budgeted pipeline shards in the same units it packed in.
      tokenCount: Column => Column = TextAnalysis.tokenCountWs)
      : DataFrame = {
    // Driver-side (the packAssignments rule): 0 dies executor-side in
    // the DIV; a negative value silently emits truncation-not-floor
    // negative shard ids.
    require(packsPerShard > 0, s"packsPerShard=$packsPerShard must be positive")
    packAssignments(docs, budgetTokens, rangeSize, tokenCount)
      .withColumn("shard_id",
        expr(s"pack_id DIV ${packsPerShard}L")) // pack_id >= 0: DIV == floor
      .groupBy(col("lang"), col("shard_id"))
      .agg(count_distinct(col("pack_id")).as("n_packs"),
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tokens"))
  }

  /** The shard-row frame [[writeShards]] writes, factored out so the
    * plan spec can pin its shape: text rides through packAssignments'
    * window exchange (`carryText`), so the frame contains NO join of the
    * corpus back to its assignments — the pre-refactor doc_id sort-merge
    * join re-sorted the entire text column a second time.
    */
  private[graft] def shardRows(docs: DataFrame, budgetTokens: Long,
      packsPerShard: Long, rangeSize: Long,
      tokenCount: Column => Column = TextAnalysis.tokenCountWs)
      : DataFrame = {
    require(packsPerShard > 0, s"packsPerShard=$packsPerShard must be positive")
    packAssignments(docs, budgetTokens, rangeSize, tokenCount,
      carryText = true)
      .withColumn("shard_id",
        expr(s"pack_id DIV ${packsPerShard}L")) // pack_id >= 0: DIV == floor
      .select(col("doc_id"), col("lang"), col("shard_id"), col("pack_id"),
        col("toks"), col("text"))
  }

  /** Shard WRITER — [[shardManifest]] materialized: the packed corpus
    * written as parquet partitioned by `(lang, shard_id)`, ONE file per
    * shard with rows in doc_id (= pack) order, so a training job's shard
    * read is a single sequential scan of a single directory — the final
    * step that turns the manifest into something a data loader consumes.
    *
    * Scale shape: `repartition(lang, shard_id)` gives every shard exactly
    * one write task (parallelism = number of shards, each bounded by
    * `budgetTokens × packsPerShard` worth of text), and
    * `sortWithinPartitions(doc_id)` fixes the in-file row order without a
    * global sort. `partitionBy` on the same keys means each task writes
    * exactly one file into its own directory — the one-file-per-shard
    * invariant [[shardFilesReport]] audits.
    */
  def writeShards(docs: DataFrame, outDir: String, budgetTokens: Long = 2048L,
      packsPerShard: Long = 4L, rangeSize: Long = 100000L,
      tokenCount: Column => Column = TextAnalysis.tokenCountWs): Unit = {
    shardRows(docs, budgetTokens, packsPerShard, rangeSize, tokenCount)
      .repartition(col("lang"), col("shard_id"))
      // Leading partition columns matter: the file writer REQUIRES child
      // ordering by its partition columns and inserts its own sort if the
      // given ordering doesn't satisfy them — and that inserted sort by
      // (lang, shard_id) alone is only incidentally stable (spill-merge
      // interleaves equal keys), which would silently break the in-file
      // doc_id order. Prefix-matching the requirement keeps OUR sort.
      .sortWithinPartitions(col("lang"), col("shard_id"), col("doc_id"))
      .write.mode("overwrite").partitionBy("lang", "shard_id")
      .parquet(outDir)
  }

  /** Audit over the WRITTEN shard layout: re-read the parquet from disk
    * and report, per (lang, shard_id), the file count — which MUST be 1,
    * the sequential-read guarantee — plus pack/doc/token totals. The
    * oracle recomputes the same totals from the SOURCE table with
    * `n_files` pinned to the literal 1, so a drifting writer (row loss,
    * split files, misassigned docs) turns the hash red, not just a spec.
    */
  def shardFilesReport(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    spark.read.parquet(outDir)
      // input_file_name is non-deterministic — projected to an attribute
      // first (it cannot appear inside an aggregate expression).
      .select(col("lang"), col("shard_id").cast("long").as("shard_id"),
        col("pack_id"), col("toks"), input_file_name().as("fname"))
      .groupBy(col("lang"), col("shard_id"))
      .agg(count_distinct(col("fname")).as("n_files"),
        count_distinct(col("pack_id")).as("n_packs"),
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tokens"))

  /** Corpus vocabulary head: the `k` most frequent whitespace tokens with
    * occurrence and document frequencies — the input to vocabulary /
    * stopword construction. Scale shape: explode → ONE hash aggregation
    * keyed on the token (map-side partial combine collapses each
    * partition's repeats before the shuffle) → global top-k, which Spark
    * plans as `TakeOrderedAndProject` (per-partition heaps, no full sort).
    * Ties break lexicographically so the cut is deterministic.
    */
  def vocabTopK(docs: DataFrame, k: Int = 100): DataFrame = {
    val toks = TextAnalysis.explodedTokens(docs)
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("occurrences"),
        count_distinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("token").asc)
      .limit(k)
  }

  /** The 100 TB twin of [[vocabTopK]]: Misra–Gries heavy-hitter sketch
    * (Misra & Gries 1982; mergeability per Agarwal et al. 2012, "Mergeable
    * Summaries"). [[vocabTopK]]'s exact aggregation shuffles one partial
    * count per (partition, distinct token) — fine for word-ish vocabularies,
    * quadratic pain when the token space explodes (URLs, hashes, code
    * identifiers). The sketch bounds BOTH memory and shuffle by `capacity`:
    *
    *  1. map side: each partition keeps at most `capacity` counters
    *     (classic decrement-all-on-overflow; amortized O(1) per token) —
    *     this is the rare genuinely-imperative per-partition case, so
    *     `mapPartitions` is the right tool, not a UDF workaround;
    *  2. merge: candidate partials (≤ capacity rows per partition, NOT the
    *     corpus) are hash-aggregated, then reduced back to ≤ `capacity`
    *     counters by subtracting the (capacity+1)-th largest combined count
    *     — the mergeable-summaries reduction, which keeps the total
    *     undercount ≤ n/(capacity+1) for n total tokens.
    *
    * Output: `token`, `est_occurrences` (a LOWER bound on the true count;
    * never an overcount), `err_bound` = ⌊n/(capacity+1)⌋ (the worst-case
    * undercount — every token with true count above it is guaranteed
    * present). `doc_freq` is not tracked (a per-doc distinct inside the
    * sketch would reintroduce the memory blowup). Results depend on the
    * physical partition layout, so this is spec-pinned against the exact
    * form (like [[langStatsApprox]]) rather than oracle-hashed.
    */
  def vocabTopKSketch(docs: DataFrame, k: Int = 100,
      capacity: Int = 4096): DataFrame =
    vocabSketchCandidates(docs, capacity)
      .orderBy(col("est_occurrences").desc, col("token").asc)
      .limit(k)

  /** The full merged Misra–Gries summary behind [[vocabTopKSketch]] —
    * ≤ `capacity` candidate rows; exposed so specs can assert the
    * every-heavy-hitter-survives guarantee on the whole candidate set,
    * not just the top-k cut.
    */
  private[graft] def vocabSketchCandidates(docs: DataFrame,
      capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextAnalysis.explodedTokens(docs).select(col("token")).as[String]
    // Per-partition summary (the shared Misra-Gries kernel —
    // Sketches.misraGries — one overflow discipline for this estimate
    // path AND Sketches.heavyTokens' exact-recount candidate pass).
    // Each partition also emits one null-token sentinel carrying its
    // item count, so the global error bound needs no second corpus scan.
    val partials = toks.mapPartitions { it =>
      val (counts, n) = Sketches.misraGries(it, capacity)
      counts.iterator.map { case (t, c) => (t, c) } ++
        Iterator((null: String, n))
    }.toDF("token", "cnt")
    // Candidate set is tiny (<= capacity per partition) — checkpoint so the
    // offset probe and the final projection don't each rescan the corpus.
    val merged = partials.groupBy(col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .barrier()
    val cands = merged.where(col("token").isNotNull)
    val nDf = merged.agg(sum(when(col("token").isNull, col("cnt"))
      .otherwise(lit(0L))).as("n_tokens"))
    // Mergeable-summaries reduction: the (capacity+1)-th largest combined
    // count (0 when fewer candidates survive) comes off every counter.
    val offDf = cands.orderBy(col("cnt").desc).limit(capacity + 1)
      .agg(when(count(lit(1)) === capacity + 1, min(col("cnt")))
        .otherwise(lit(0L)).as("off"))
    cands.crossJoin(broadcast(offDf)).crossJoin(broadcast(nDf))
      .select(col("token"),
        (col("cnt") - col("off")).as("est_occurrences"),
        expr(s"n_tokens DIV ${capacity + 1}").as("err_bound"))
      .where(col("est_occurrences") > 0)
  }

  /** Per-language corpus statistics: document count, total tokens, and
    * EXACT interpolated token-count percentiles (median + p90) — the
    * length-distribution report a curation pipeline reads before choosing
    * truncation/packing parameters. `percentile` (not `approx_percentile`)
    * keeps the value engine-reproducible: both Spark and DuckDB interpolate
    * `a[k] + g·(a[k+1] − a[k])` at rank `p·(n−1)`, so the doubles match
    * bit-for-bit. At 100 TB exact percentiles shuffle each group's values;
    * swap in `approx_percentile` when the report tolerates error bounds.
    */
  def langStats(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(col("lang"),
      TextAnalysis.tokenCountWs(col("text")).cast("long").as("toks"))
    perDoc.groupBy(col("lang")).agg(
      count(lit(1)).as("docs"),
      sum(col("toks")).as("tokens"),
      expr("percentile(toks, 0.5)").as("median_tokens"),
      expr("percentile(toks, 0.9)").as("p90_tokens"))
  }

  /** The 100 TB twin of [[langStats]]: `approx_percentile` (t-digest-
    * style mergeable sketch, map-side combined) instead of exact
    * `percentile`, so no group ever gathers its full value list. Not
    * oracle-hashable (sketch results are engine-specific) — accuracy is
    * pinned by a spec against the exact form instead; `accuracy` is
    * Spark's 1/epsilon knob (10000 ≈ 0.01% rank error).
    */
  def langStatsApprox(docs: DataFrame, accuracy: Int = 10000): DataFrame = {
    val perDoc = docs.select(col("lang"),
      TextAnalysis.tokenCountWs(col("text")).cast("long").as("toks"))
    perDoc.groupBy(col("lang")).agg(
      count(lit(1)).as("docs"),
      sum(col("toks")).as("tokens"),
      expr(s"approx_percentile(toks, 0.5, $accuracy)").as("median_tokens"),
      expr(s"approx_percentile(toks, 0.9, $accuracy)").as("p90_tokens"))
  }

  /** The decontamination gram width — ONE constant, because the train
    * side (pre-built shingle sets) and the eval side (evalGramHashes)
    * are built in separate calls: if the two widths ever drifted, train
    * k-grams would never match eval n-grams and contamination detection
    * would silently go all-clean.
    */
  private[graft] val DecontamGramSize = 8

  /** The eval side of decontamination — distinct hashed word-n-grams of
    * the eval corpus — as ONE definition shared by the batch sweep and
    * the streaming monitor, so a future cap/hash change cannot make the
    * spec-pinned stream≡batch identity drift.
    */
  private[graft] def evalGramHashes(evalDocs: DataFrame, n: Int): DataFrame =
    Dedup.shingleSets(evalDocs, n)
      .select(explode_outer(col("sset")).as("g"))
      // Filter BEFORE hashing: token-less docs carry an empty sset whose
      // outer explode emits a null gram, and xxhash64(null) returns the
      // SEED (42), not null — unfiltered, an empty eval doc would plant
      // gh=42 in the broadcast set and flag every empty train doc as
      // contaminated (the oracle joins gram STRINGS, where NULL never
      // matches).
      .where(col("g").isNotNull)
      .select(xxhash64(col("g")).as("gh")).distinct()

  /** Benchmark decontamination: flag every training document sharing at
    * least one word-`n`-gram with the evaluation corpus — the standard
    * train/test-contamination sweep (GPT-3 §4 / PaLM-style 8-13-gram
    * overlap) every serious training-data pipeline runs before a corpus
    * ships. Output: one row per training doc with the count of its
    * distinct grams that appear anywhere in the eval set and the
    * `contaminated` verdict.
    *
    * Scale shape: the eval side (benchmarks — millions of grams at most)
    * is collapsed to DISTINCT gram hashes and BROADCAST; the train side
    * streams through a map-side hash-join probe, so the 100 TB corpus is
    * never shuffled — the only exchange is the per-doc hit aggregation,
    * keyed on doc_id. Joining on `xxhash64(gram)` keeps the probe keys at
    * 8 bytes (a 64-bit collision within an eval gram set is negligible;
    * the oracle joins the gram strings themselves and counts agree).
    */
  def decontaminate(train: DataFrame, evalDocs: DataFrame,
      n: Int = DecontamGramSize): DataFrame =
    decontaminateFromSets(Dedup.shingleSets(train, n), evalDocs, n)

  /** [[decontaminate]] from a pre-built train-side (`doc_id`, `sset`)
    * shingle-set table — lets [[curationReport]] derive the grams from its
    * shared tokenization instead of re-scanning the corpus text.
    */
  private[graft] def decontaminateFromSets(trainSets: DataFrame,
      evalDocs: DataFrame, n: Int = DecontamGramSize): DataFrame =
    decontamHits(trainSets, evalDocs, n)
      .select(col("doc_id"), col("gram_hits"),
        (col("gram_hits") > 0).as("contaminated"))

  /** Shared decontamination core: per-train-doc eval-gram hit count plus
    * the doc's distinct-gram total — the inputs both the any-hit sweep
    * ([[decontaminate]]) and the overlap-fraction sweep
    * ([[decontaminateFrac]]) project from.
    */
  private def decontamHits(trainSets: DataFrame, evalDocs: DataFrame,
      n: Int): DataFrame = {
    // ONE pass over the exploded grams: a broadcast LEFT join against the
    // eval set keeps every gram row, so the same doc_id aggregation counts
    // both the total (count(g) — skips the null row an empty sset's outer
    // explode emits) and the hits (count of matched eval rows). The
    // alternative — a second branch reading size(sset) off trainSets —
    // re-runs the whole-corpus tokenization+shingle transform (the
    // dominant decontam cost), because unlike the any-hit sweep's
    // doc_id-only base branch it defeats column pruning.
    // explode_outer, not explode: the inner variant's inferred
    // size(sset) > 0 filter inlines the gram transform below the token
    // projection and re-tokenizes per element (see Dedup.explodedShingles).
    // The hash is guarded rather than the row filtered: xxhash64(null)
    // returns the SEED (42), but a null join KEY simply never matches.
    // Null-id train docs dropped (the family rule, oracle-mirrored):
    // the per-doc aggregation below would otherwise MERGE every null-id
    // doc into ONE verdict row whose hits/totals sum across different
    // documents — a clean null-id doc swallowed by a contaminated one.
    val trainGrams = trainSets
      .where(col("doc_id").isNotNull)
      .select(col("doc_id"), explode_outer(col("sset")).as("g"))
      .select(col("doc_id"), col("g"),
        when(col("g").isNotNull, xxhash64(col("g"))).as("gh"))
    val evalGrams = evalGramHashes(evalDocs, n)
      .withColumn("__hit", lit(1))
    trainGrams.join(broadcast(evalGrams), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("__hit")).as("gram_hits"),
        count(col("g")).as("total_grams"))
      .select(col("doc_id"), col("gram_hits"), col("total_grams"))
  }

  /** Overlap-FRACTION decontamination — the graded form of
    * [[decontaminate]]: instead of flagging on any shared gram, report the
    * fraction of a training document's distinct word-`n`-grams that occur
    * in the evaluation corpus and flag only documents whose fraction
    * reaches `fracThreshold` (the GPT-3/PaLM-style "substantially
    * overlapping" rule — a single boilerplate gram should not disqualify a
    * long document, while a short doc embedded in an eval answer should).
    *
    * Determinism: `hit_frac` is an exact integer rational
    * (gram_hits / total_grams) floor-quantized at 1e-6 ([[Quant.q6]]), and
    * the threshold compares the QUANTIZED value, so both engines agree by
    * construction. Token-less docs (total_grams = 0) report fraction 0.
    *
    * Scale shape: identical to [[decontaminate]] — the eval gram set
    * broadcasts, the corpus is never shuffled; the only exchange is the
    * per-doc hit aggregation.
    */
  def decontaminateFrac(train: DataFrame, evalDocs: DataFrame,
      n: Int = DecontamGramSize, fracThreshold: Double = 0.08): DataFrame = {
    val base = decontamHits(Dedup.shingleSets(train, n), evalDocs, n)
    val frac = when(col("total_grams") === 0L, lit(0.0))
      .otherwise(Quant.q6(col("gram_hits").cast("double") /
        col("total_grams").cast("double")))
    base.select(col("doc_id"), col("gram_hits"), col("total_grams"),
      frac.as("hit_frac"),
      (frac >= lit(fracThreshold)).as("contaminated"))
  }

  /** Benchmark-side leak ATTRIBUTION — the eval pivot of
    * [[decontaminate]]: per evaluation document, how many TRAINING
    * documents share at least one word-`n`-gram with it
    * (`n_train_docs`), how many of its own distinct grams appear
    * anywhere in the training corpus (`leaked_grams`), and its distinct
    * gram total. The question a benchmark owner asks ("which of MY
    * items are compromised, and how badly") where `decontaminate`
    * answers the trainer's ("which of my docs must go").
    *
    * Scale shape: the eval gram table broadcasts (eval corpora are
    * small by definition); the training corpus tokenizes once map-side
    * and only MATCHED (train_id, eval_id, gram) rows — the contamination
    * volume, not the corpus — reach the per-eval aggregation. The two
    * distinct-counts ride one aggregation (Expand ×2 on the matched
    * sliver). Grams join as STRINGS, exactly like the oracle — no hash
    * collision tolerance anywhere.
    *
    * Null-id eval docs are excluded (verdicts are per identity — the
    * family rule); a null-id TRAIN doc still leaks grams
    * (`leaked_grams` counts gram matches) but cannot be counted as a
    * document (count(DISTINCT train_id) skips nulls in both engines).
    */
  def leakReport(train: DataFrame, evalDocs: DataFrame,
      n: Int = DecontamGramSize): DataFrame = {
    val evSets = Dedup.shingleSets(
      evalDocs.where(col("doc_id").isNotNull), n)
    // Totals straight off the set size — NOT via the exploded table: an
    // empty sset explodes to nothing in SQL (the doc would vanish from
    // the report) while size() keeps the 0-gram row on both engines.
    val evalTotals = evSets.select(col("doc_id").as("eval_id"),
      size(col("sset")).cast("long").as("total_grams"))
    val evGrams = evSets
      .select(col("doc_id").as("eval_id"), explode_outer(col("sset")).as("g"))
      .where(col("g").isNotNull)
    val tg = Dedup.shingleSets(train, n)
      .select(col("doc_id").as("train_id"), explode_outer(col("sset")).as("g"))
      .where(col("g").isNotNull)
    val leaks = tg.join(broadcast(evGrams), Seq("g"))
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("train_id")).as("n_train_docs"),
        countDistinct(col("g")).as("leaked_grams"))
    evalTotals.join(leaks, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("leaked_grams"), lit(0L)).as("leaked_grams"),
        col("total_grams"))
  }

  /** PII redaction: scrub emails, NANP-style phone numbers, and IPv4
    * addresses with typed placeholder tokens, counting each category per
    * document — the standard pre-release curation stage. Patterns stick to
    * the RE2 ∩ java.util.regex common subset (character classes, bounded
    * quantifiers, `\b` — no lookaround, no backreferences), so the DuckDB
    * oracle replays them byte-identically; counts are taken STAGE-WISE on
    * the progressively-scrubbed text (an IP-looking string inside an
    * already-redacted email is not double-counted), and both engines'
    * `regexp_replace` scan left-to-right non-overlapping, so the outputs
    * agree exactly.
    *
    * Map-only — no shuffle, no UDFs; at 100 TB this is a pure scan stage
    * that pipelines into whatever ships the cleaned corpus.
    */
  val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val phoneRe = """\b\d{3}[-.]\d{3}[-.]\d{4}\b"""
  val ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  def piiScrub(docs: DataFrame): DataFrame = {
    // null ≡ empty (the wsTokens contract): without the coalesce a
    // null-text doc null-propagates into NULL counts and changed=NULL,
    // which three-valued-logic filters drop from BOTH branches.
    val txt = coalesce(col("text"), lit(""))
    val t1 = regexp_replace(txt, emailRe, "<EMAIL>")
    val s1 = docs.select(col("doc_id"), txt.as("text"),
      regexp_count(txt, lit(emailRe)).cast("long").as("n_emails"),
      t1.as("t1"))
    val s2 = s1.select(col("doc_id"), col("text"), col("n_emails"),
      regexp_count(col("t1"), lit(phoneRe)).cast("long").as("n_phones"),
      regexp_replace(col("t1"), phoneRe, "<PHONE>").as("t2"))
    s2.select(col("doc_id"), col("n_emails"), col("n_phones"),
      regexp_count(col("t2"), lit(ipv4Re)).cast("long").as("n_ips"),
      md5(regexp_replace(col("t2"), ipv4Re, "<IP>")).as("clean_hash"),
      (regexp_replace(col("t2"), ipv4Re, "<IP>") =!= col("text")).as("changed"))
  }

  /** Streaming exact dedup over a document stream: emit each text's
    * first-seen row, suppress replays that arrive within the watermark
    * delay of the original. State carries only the 32-char md5 (never the
    * body) and — the part that matters at stream scale —
    * `dropDuplicatesWithinWatermark` EXPIRES each hash once the watermark
    * passes it, so state is bounded by the dedup horizon instead of
    * growing with the corpus (a plain `dropDuplicates` keyed on the hash
    * retains every hash ever seen). Crawl pipelines pair this horizon
    * dedup with the batch [[Dedup.exactDedup]] sweep over the landed data.
    *
    * `tsCol` is the event-time column the watermark tracks.
    */
  def streamingExactDedup(docs: DataFrame, tsCol: String = "ts",
      delay: String = "10 minutes"): DataFrame =
    // md5(coalesce(..., '')): a null-text doc hashes like an empty one
    // (null ≡ empty) instead of carrying a NULL hash that every
    // hash-equality join silently drops. Null event-time filter before
    // the stateful stage (the streaming twins' convention): a null ts
    // has no watermark semantics and its dedup behavior would differ
    // between the four streaming twins for the same malformed input.
    // doc_id filter: the exact-dedup family's null-id rule
    // ([[Dedup.exactGroupsFromHashes]]) — a no-identity doc is excluded
    // up front, so the stream can never emit (or, worse, OCCUPY the
    // first-seen slot of) a row the batch sweep would have dropped.
    docs.where(col(tsCol).isNotNull && col("doc_id").isNotNull)
      .withColumn("text_hash", md5(coalesce(col("text"), lit(""))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")

  /** End-to-end curation report: every shipped gate evaluated per
    * document — Gopher quality, exact-dup canonical copy, near-dup
    * cluster representative (MinHash+LSH connected components),
    * benchmark decontamination, stratified-sampling coin — with the final
    * `kept` verdict as their conjunction. This is the audit table a
    * pipeline operator reads to see what each stage removes and what
    * survives end-to-end; stage verdicts are computed INDEPENDENTLY
    * (not sequentially re-filtered), so a flipped flag always attributes
    * the removal to one named stage.
    *
    * Scale shape is inherited stage-by-stage from the underlying
    * operators (each documented at its definition); the report itself is
    * five doc_id-keyed joins of one-row-per-doc stage outputs.
    *
    * The corpus is tokenized ONCE: a persisted base table carries
    * (doc_id, lang, chars, md5, toks), and every stage consumes it through
    * its `FromTokens`/`FromSets` entry point — the naive composition ran
    * the regex split and full-text md5 in four independent plan branches,
    * each a separate 100 TB scan. The report rows (doc_id + six booleans)
    * are materialized eagerly so the cache can be released before return.
    *
    * `baseTablePath` is the 100 TB knob, and parquet materialization is
    * the DEFAULT: the tokenized base table is written ONCE and every
    * stage re-reads it from storage — bounded by the filesystem, not
    * executor disks, at the price of per-stage re-reads of a columnar
    * (and column-pruned) table. An executor `MEMORY_AND_DISK` persist
    * would instead cache a corpus-sized table, so local disks must
    * absorb ~1× the input or the job thrashes — the wrong default at
    * corpus scale. With `baseTablePath = None` the table goes to an
    * auto-derived scratch dir under `spark.sql.warehouse.dir` (shared
    * storage on a real cluster) and is deleted once the report rows are
    * materialized; passing a path keeps the base table there for reuse.
    * Same rows either way (spec-pinned).
    */
  def curationReport(train: DataFrame, evalDocs: DataFrame,
      rates: Map[String, Double] = Map("en" -> 0.5, "zh" -> 0.125),
      defaultRate: Double = 0.25,
      baseTablePath: Option[String] = None): DataFrame = {
    // Null-id docs are EXCLUDED up front, documented (the uniformSample
    // pattern): every stage verdict re-attaches by inner doc_id equi-join,
    // where a NULL key never matches — such a doc would flow through all
    // five gates and then silently vanish from the audit table, breaking
    // the every-removal-is-attributed promise. (It is ALSO the exact-dedup
    // family's null-id rule — [[Dedup.exactGroupsFromHashes]] — so the
    // e_keep stage sees the same population the standalone sweep would.)
    val baseRaw = train.where(col("doc_id").isNotNull)
      .select(col("doc_id"), col("lang"),
        length(col("text")).as("chars"),
        // coalesce: a NULL th would make the exact-dup equi-join drop
        // the doc from the report entirely (NULL === NULL is not true).
        md5(coalesce(col("text"), lit(""))).as("th"),
        TextAnalysis.wsTokens(col("text")).as("toks"))
    val spark = train.sparkSession
    val (basePath, autoScratch) = baseTablePath match {
      case Some(path) => (path, false)
      case None =>
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        (s"${wh.stripSuffix("/")}/graft_curation_base_" +
          java.util.UUID.randomUUID().toString.take(8), true)
    }
    // The write sits INSIDE the try: a failure mid-write (the likeliest
    // failure in this function — it materializes a corpus-sized table) must
    // also reach the finally, or the partial scratch dir leaks forever
    // (its UUID name is never revisited).
    val setsPath = s"$basePath-sets"
    def deleteQuiet(path: String): Unit =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[graft] curation scratch cleanup failed for $path: " +
            e.getMessage)
      }
    try {
    baseRaw.write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)
    // Independent gates run CONCURRENTLY (guide §2.6 — overlap
    // independent jobs): the scheduler happily runs jobs from several
    // driver threads, so the gopher/exact-dup/decontam gate jobs
    // back-fill executor slots while this thread drives the serial
    // near-dup chain (sets write → LSH pairs → CC rounds). Each
    // concurrent gate materializes its tiny (doc_id, flag) verdict
    // table (released once the report rows exist); the final join
    // consumes the same verdicts it used to compute inline, so the
    // output is unchanged (spec-pinned). 3 threads: enough to fill the
    // tail, not enough to fight the main chain for executors.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    val gateBarriers =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    def gate(name: String)(df: => DataFrame): Future[DataFrame] = Future {
      // Job descriptions are thread-local — each gate labels its own jobs.
      spark.sparkContext.setJobDescription(s"curation: $name gate")
      try { val b = Barrier(df); gateBarriers.add(b); b }
      finally spark.sparkContext.setJobDescription(null)
    }
    try {
      val fq = gate("gopher") {
        gopherQualityFromTokens(base)
          .select(col("doc_id"), col("keep").as("q_keep"))
      }
      val fe = gate("exact-dup") {
        val eg = Dedup.exactGroupsFromHashes(
          base.select(col("doc_id"), col("th").as("text_hash")))
        base.select(col("doc_id"), col("th"))
          .join(eg, col("th") === col("text_hash"))
          .select(col("doc_id"),
            (col("doc_id") === col("keep_id")).as("e_keep"))
      }
      val fd = gate("decontam") {
        decontaminateFromSets(
            Dedup.shingleSetsFromTokens(base, DecontamGramSize),
            evalDocs, DecontamGramSize)
          .select(col("doc_id"), (!col("contaminated")).as("d_keep"))
      }
      // Near-dup clustering (this thread): the shingle-set table feeds
      // three branches (signatures + both verify join sides), so it must
      // materialize. It is corpus-×-shingle sized — LARGER than the base
      // table whose executor-disk cache the docstring above rejects at
      // 100 TB — so it gets the same filesystem-scratch treatment as the
      // base: written once, re-read per branch from storage (bounded by
      // the filesystem, not executor disks), deleted in the finally.
      // Unlike the base, the sets scratch is ALWAYS ours to delete, even
      // when the caller keeps the base table.
      Dedup.shingleSetsFromTokens(base, 3)
        .write.mode("overwrite").parquet(setsPath)
      val sets3 = spark.read.parquet(setsPath)
      val pairs = Dedup.minhashNearDupsFromSets(sets3)
      val c = Dedup.dupClusters(base.select(col("doc_id")), pairs)
        .select(col("doc_id"), (col("cluster") === col("doc_id")).as("c_keep"))
      val s = base.select(col("doc_id"),
        sampleKeep(rates, defaultRate).as("s_keep"))
      val q = Await.result(fq, Duration.Inf)
      val e = Await.result(fe, Duration.Inf)
      val d = Await.result(fd, Duration.Inf)
      q.join(e, Seq("doc_id")).join(c, Seq("doc_id"))
        .join(d, Seq("doc_id")).join(s, Seq("doc_id"))
        .select(col("doc_id"), col("q_keep"), col("e_keep"), col("c_keep"),
          col("d_keep"), col("s_keep"),
          (col("q_keep") && col("e_keep") && col("c_keep") &&
            col("d_keep") && col("s_keep")).as("kept"))
        .barrier()
    } finally {
      // Gate cleanup on EVERY exit: stop accepting work, wait (bounded)
      // for in-flight gate materializations to finish registering their
      // barriers, then release them — once the report rows are
      // materialized the gate checkpoints are superseded, and on a
      // failure path they must not strand for the session (Verify
      // catches per-query failures and continues).
      pool.shutdown()
      pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
      gateBarriers.forEach(b => Barrier.release(b))
    }
    // Once the report rows are materialized (or the report FAILED — the
    // finally guarantees a crashed stage doesn't leak a corpus-sized
    // scratch dir under the warehouse), an auto-derived scratch base
    // table is dead weight — drop it. A caller-supplied path is the
    // caller's to keep (reuse across reports / debugging).
    } finally {
      // Best-effort (deleteQuiet): the likeliest failure is mid-write
      // against a broken filesystem, and a throwing finally would
      // REPLACE the root-cause exception with a cleanup error.
      deleteQuiet(setsPath)
      if (autoScratch) deleteQuiet(basePath)
    }
  }

  /** Streaming twin of [[decontaminate]] — the contamination MONITOR a
    * crawl pipeline runs at ingest: eval-benchmark grams are STATIC
    * (distinct-hashed once, broadcast into a stream-static semi join, so
    * the probe itself is stateless); per-doc hit counts aggregate under
    * a 1-minute event-time window + watermark, emitting each
    * contaminated doc's row once the watermark passes (append mode).
    * Emits ONLY contaminated docs (a hit-less doc contributes no rows
    * past the semi join — the alert-stream semantic; the batch sweep is
    * the exhaustive per-doc report). State = in-flight (doc, window)
    * counts, bounded by the watermark horizon.
    */
  def streamingDecontaminate(docs: DataFrame, evalDocs: DataFrame,
      n: Int = DecontamGramSize, tsCol: String = "ts",
      delay: String = "10 minutes"): DataFrame = {
    val evalGrams = evalGramHashes(evalDocs, n)
    // The streaming twins' null guards (streamingExactDedup /
    // streamingChunkDedup convention): a null event time forms a
    // (doc, NULL-window) group the append-mode eviction predicate can
    // never emit OR expire — permanent state growth; a null doc_id
    // would alert under a key a sink cannot dedupe.
    val toks = docs
      .where(col(tsCol).isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"), col(tsCol).as("ts"),
        TextAnalysis.wsTokens(col("text")).as("toks"))
    // ts carried alongside the shingle build (re-joining it from a
    // second derivation of the same stream would be a stream-stream
    // self join); toks stays a projection barrier for the gram lambda.
    val trainGrams = toks
      .select(col("doc_id"), col("ts"),
        Dedup.shinglesFromTokens(col("toks"), n).as("sset"))
      .select(col("doc_id"), col("ts"), explode_outer(col("sset")).as("g"))
      .where(col("g").isNotNull) // see evalGramHashes: xxhash64(null)=seed
      .select(col("doc_id"), col("ts"), xxhash64(col("g")).as("gh"))
    // Watermark BEFORE the semi join: the watermark tracks max event
    // time over rows flowing through its node, and a clean document's
    // grams are all filtered by the join — annotated after it, a stream
    // of clean docs would never advance the watermark and nothing would
    // ever emit in append mode.
    trainGrams.withWatermark("ts", delay)
      .join(broadcast(evalGrams), Seq("gh"), "left_semi")
      // At-least-once redelivery FIRST-WINS (the streamingExactDedup
      // rule): a redelivered doc's gram rows would otherwise DOUBLE
      // gram_hits inside the same (doc, window) group — or emit a
      // second alert row under a retry's shifted ts — where the batch
      // twin counts each distinct gram once. Grams are per-doc DISTINCT
      // by construction (shingle SETS), so the dedup is a no-op on
      // clean delivery. It sits AFTER the stateless semi join so the
      // dedup state holds only MATCHED (doc_id, gh) keys within the
      // watermark horizon — contamination-sized, not corpus-sized.
      .dropDuplicatesWithinWatermark("doc_id", "gh")
      .groupBy(col("doc_id"), window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("gram_hits"))
      .select(col("doc_id"), col("gram_hits"),
        lit(true).as("contaminated"))
  }

  /** Streaming twin of [[sourceMix]]: the per-(source, lang) doc/token
    * cells maintained incrementally over the document stream — the live
    * table a data-mixing controller watches to adjust sampling weights as
    * a crawl progresses. `token_share` is deliberately NOT computed here:
    * a second global aggregation over an aggregated stream is not
    * expressible in Structured Streaming, and the share is one broadcast
    * division over the (sources × langs)-sized cell table at read time.
    * State = the cell table itself — thousands of rows, not the corpus.
    * Run in update mode (per-batch deltas) or complete mode (full table);
    * the stream-final ≡ batch identity is spec-pinned.
    */
  def streamingSourceMixCells(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("lang"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("toks"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"))

  /** Streaming twin of [[vocabTopK]] (complete mode): the running top-`k`
    * vocabulary head over the document stream. `doc_freq` uses
    * `approx_count_distinct` — exact distinct counting is unsupported in
    * streaming aggregations; HLL++ is exact while a token's doc set stays
    * in the sparse range and within its rsd beyond, which is the standard
    * trade for a live vocabulary board. Occurrences are exact. State is
    * vocabulary-sized (every distinct token), the inherent floor for any
    * exact-occurrence vocabulary stream; complete mode re-emits the
    * sorted head each trigger, which is what a monitoring sink wants.
    */
  def streamingVocabTopK(docs: DataFrame, k: Int = 100): DataFrame =
    TextAnalysis.explodedTokens(docs)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("occurrences"),
        approx_count_distinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("token").asc)
      .limit(k)

  /** Streaming twin of the chunk-level dedup
    * ([[TextAnalysis.paragraphDedup]]): explode each arriving document
    * into 10-token chunks and emit only chunks whose hash was NOT seen
    * within the watermark horizon — first-seen chunks survive, later
    * repeats (boilerplate replays) are suppressed. State carries only the
    * 32-char chunk hash and expires with the watermark, so it is bounded
    * by the dedup horizon, not the corpus — the same state discipline as
    * [[streamingExactDedup]], one level below the document.
    */
  def streamingChunkDedup(docs: DataFrame, tsCol: String = "ts",
      delay: String = "10 minutes", chunkTokens: Int = 10): DataFrame = {
    // Null event-time AND null doc_id filters before the stateful stage
    // (the streaming twins' convention — see streamingExactDedup): a
    // null-id doc's chunks would otherwise occupy first-seen chunk_hash
    // slots (suppressing a real doc's identical chunks) and emit
    // survivor rows under a key a sink cannot dedupe; batch
    // paragraphDedup drops null-id docs up front, the family rule.
    val toks = docs.where(col(tsCol).isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"), col(tsCol),
        TextAnalysis.wsTokens(col("text")).as("toks"))
    val chunks = toks.select(col("doc_id"), col(tsCol),
      TextAnalysis.chunkStructs(col("toks"), chunkTokens).as("cs"))
    chunks
      .select(col("doc_id"), col(tsCol), posexplode_outer(col("cs")).as(Seq("pos", "c")))
      .filter(col("c.clen") > 0)
      .select(col("doc_id"), col(tsCol), col("pos"),
        col("c.chunk").as("chunk"), md5(col("c.chunk")).as("chunk_hash"))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("chunk_hash")
  }

  /** Corpus snapshot diff: classify every doc_id across two corpus
    * versions as added / removed / changed / unchanged by CONTENT hash —
    * the audit an incremental-ingestion pipeline runs between snapshots
    * (what did yesterday's crawl actually change?), and the input to
    * retrain-or-not decisions (a persisted-index rebuild is only due
    * when `changed + added` is material).
    *
    * Null text hashes like empty text (the null ≡ empty contract), so a
    * null→'' rewrite between versions reads as `unchanged` — the
    * pipeline treats them identically everywhere else too.
    *
    * 100 TB shape: each side collapses to (doc_id, md5) IN ITS SCAN —
    * the join ships 2×16-byte hashes per doc, never text; the full-outer
    * join is ONE co-partitioned hash/merge join on doc_id (both sides
    * corpus-sized, so no broadcast exists — this is the minimal shape).
    * If both snapshots are stored bucketed by doc_id the exchange
    * disappears entirely.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    corpusDiffBy(oldDocs, newDocs, md5(coalesce(col("text"), lit(""))))

  /** [[corpusDiff]] generalized over the CONTENT-IDENTITY column — the
    * hook the non-text index families sync through: the media index
    * diffs by payload bytes (`md5(payload)` — a re-encode that leaves
    * text equal but bytes different must read `changed` there), and the
    * stats index diffs by the full (lang, source, text) cell identity
    * (a source reattribution with unchanged text MOVES a row between
    * cells, so it must read `changed` too). `identity` is evaluated
    * against each snapshot's row and must be non-null (coalesce inside
    * it — a NULL identity would classify as added+removed phantom
    * churn); everything else (null-id exclusion, the single hash-only
    * full-outer join, the status algebra) is [[corpusDiff]] verbatim.
    */
  def corpusDiffBy(oldDocs: DataFrame, newDocs: DataFrame,
      identity: Column): DataFrame = {
    // Null-id rows are EXCLUDED, documented (the uniformSample pattern):
    // a full-outer equi-join never matches NULL keys, so a null-id doc
    // present unchanged in both snapshots would read as one `removed`
    // plus one `added` — phantom churn feeding the rebuild decision (and
    // <=> would instead cross-match every null-id row pair).
    def hashed(d: DataFrame, as: String) = d
      .where(col("doc_id").isNotNull)
      .select(col("doc_id"), identity.as(as))
    hashed(oldDocs, "old_hash")
      .join(hashed(newDocs, "new_hash"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
