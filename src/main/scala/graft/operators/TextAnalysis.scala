package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Whitespace tokens (empty array for blank text). */
  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(wsTokens(text))

  /** BPE-ish sub-token count: alpha runs, digit runs, and single other
    * non-space chars — the standard pre-tokenizer shape.
    */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit(bpePattern))

  /** Punctuation ratio: punctuation chars / total chars (0 for empty). */
  val punctClass = "[.,!?;:]"
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, punctClass, ""))).cast("double") /
        length(text).cast("double"))

  /** English stopword ratio among whitespace tokens (quality signal). */
  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  def stopwordRatio(text: Column): Column = {
    val toks = wsTokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(enStopwords: _*))).cast("double") /
        size(toks).cast("double"))
  }

  /** Mean whitespace-token length. */
  def meanTokenLen(text: Column): Column = {
    val toks = wsTokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards reasonable length, penalizes
    * punctuation soup and stopword-free keyword mash. Deliberately simple
    * and SQL-re-expressible; the shape (length/punct/stopword mix) is the
    * standard heuristic-filter recipe.
    */
  def qualityScore(text: Column): Column = {
    val lengthTerm = least(tokenCountWs(text).cast("double") / 100.0, lit(1.0))
    val punctTerm = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopTerm = least(stopwordRatio(text) * 5.0, lit(1.0))
    round((lengthTerm * 0.4 + punctTerm * 0.3 + stopTerm * 0.3), 6)
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
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  // ---- assembled queries ------------------------------------------------

  /** Per-document token statistics. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCountWs(col("text")).as("ws_tokens"),
      tokenCountBpe(col("text")).as("bpe_tokens"),
      length(col("text")).as("chars"))

  /** Per-document quality metrics. */
  def quality(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      round(punctRatio(col("text")), 6).as("punct_ratio"),
      round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
      round(meanTokenLen(col("text")), 6).as("mean_token_len"),
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
    val toks = docs.select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val grams = toks.select(col("doc_id"),
      when(size(col("toks")) >= k,
        transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => concat_ws(" ",
            (0 until k).map(o => element_at(col("toks"), i + o)): _*)))
        .otherwise(array(concat_ws(" ", col("toks")))).as("grams"))
    val hashes = grams.select(col("doc_id"),
      transform(col("grams"),
        g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")).as("gh"))
    val fps = hashes.select(col("doc_id"),
      when(size(col("gh")) >= w,
        array_distinct(transform(sequence(lit(1), size(col("gh")) - (w - 1)),
          i => array_min(slice(col("gh"), i, lit(w))))))
        .otherwise(array(array_min(col("gh")))).as("fps"))
    fps.select(col("doc_id"), explode_outer(col("fps")).as("fingerprint"))
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
    // would otherwise re-run the whole winnowing pipeline per side.
    val fp = winnowingFingerprints(docs, k, w).localCheckpoint(eager = true)
    val rare = fp.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fingerprint"))
    val pruned = fp.join(rare, Seq("fingerprint"))
    pruned.as("a").join(pruned.as("b"),
        col("a.fingerprint") === col("b.fingerprint") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
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
    val tf = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count_distinct(col("doc_id")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    tf.join(df, Seq("token"))
      .join(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n")).cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score"), col("rank").cast("long").as("rank"))
  }
}
