package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Barrier.BarrierOps

/** Byte-pair-encoding MERGE TRAINING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the learner
  * behind the `doc_packing_bpe` budget: k bounded rounds, each choosing
  * the corpus-wide most frequent adjacent symbol pair and fusing it.
  *
  * Deviations from the reference algorithm, for cross-engine exactness
  * and bounded SQL replay:
  *  - no end-of-word marker (`</w>`): merges never cross word boundaries
  *    here anyway (training is per word), the marker only disambiguates
  *    word-final subwords in the emitted vocabulary, which this operator
  *    does not emit;
  *  - character = UTF-16 code unit on the Spark side vs code point in
  *    the SQL oracle — identical on the BMP corpus this project's data
  *    uses (ASCII by construction; see the vacuity allowlist note).
  *
  * Scale (100 TB): ONE corpus pass builds the word-frequency table (the
  * classic trainer's first step — counts word TYPES weighted by corpus
  * frequency), after which every round runs over the VOCABULARY table
  * (bounded by distinct words, not corpus size): one pair-count
  * aggregation + a driver-side argmax folded into literals — the
  * trainKeyedBooks pattern. Merge application is a map-only `aggregate`
  * fold per word (no explode, no shuffle); the vocab table is
  * localCheckpoint'ed per round so lineage stays flat.
  */
object Bpe {

  /** One learned merge: `lhs + rhs -> merged` chosen in `mergeRound`
    * because the pair occurred `pairCount` times (corpus-weighted).
    */
  case class Merge(mergeRound: Int, lhs: String, rhs: String,
      merged: String, pairCount: Long)

  /** Character-level initial symbols of a word. `split` on the empty
    * pattern yields one UTF-16 code unit per element (may include a
    * boundary empty string on some inputs — filtered).
    */
  private[graft] def charSyms(word: Column): Column =
    filter(split(word, ""), c => c =!= "")

  /** Greedy left-to-right application of ONE merge to a symbol array, as
    * a map-only fold: append each symbol, fusing it into the
    * accumulator's last element when (last, current) == (lhs, rhs).
    *
    * This replicates the scan-pointer algorithm exactly: a freshly fused
    * element can never START another fuse in the same round because its
    * value `lhs+rhs` differs from `lhs` (rhs is non-empty) — the same
    * invariant that makes the scan skip both consumed positions. For
    * self-pairs (lhs == rhs) the fold fuses at even run offsets only
    * ("aaa" -> ["aa","a"]), which is what the scan does.
    */
  private[graft] def applyMerge(syms: Column, lhs: String, rhs: String)
      : Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) &&
            s === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
        .otherwise(concat(acc, array(s))))

  /** The corpus word-frequency table: lower-cased whitespace tokens,
    * counted with multiplicity, split to character symbols.
    * `explode_outer` + null filter on the exploded attribute (the
    * explodedTokens/explodedShingles discipline): an inner explode —
    * even of the pre-materialized alias — lets InferFiltersFromGenerate
    * push a size filter below the projection with the alias substituted,
    * re-running the regex tokenization per document (empirically
    * confirmed on Spark 4.1.2; plan-locked).
    */
  private[graft] def vocab(docs: DataFrame): DataFrame =
    docs.select(TextAnalysis.wsTokens(lower(col("text"))).as("toks"))
      .select(explode_outer(col("toks")).as("word"))
      .where(col("word").isNotNull)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"), charSyms(col("word")).as("syms"))

  /** Adjacent symbol pairs of an array: zip the array against itself
    * shifted by one.
    */
  private def adjacentPairs(syms: Column): Column =
    zip_with(slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1),
      (l, r) => struct(l.as("l"), r.as("r")))

  /** One training round's argmax query over the vocab table — factored
    * out so [[graft.PlanShapeSpec]] can lock its shape (the eager
    * checkpoint in [[trainMerges]] hides the plan behind a Scan
    * ExistingRDD otherwise — the kmeansSearchPlan pattern): pair
    * explosion + count aggregation + a top-1 that must plan as
    * TakeOrderedAndProject, all over the VOCABULARY table only — no
    * round ever re-reads the corpus.
    */
  private[graft] def topPairPlan(words: DataFrame): DataFrame =
    words.where(size(col("syms")) > 1)
      // explode_outer + isNotNull, never the inner form: the inner
      // explode of the derived pair array lets InferFiltersFromGenerate
      // re-run the zip_with+slice pair build in a pushed filter — paid
      // once per training round (vocab-sized waste; the explodedTokens
      // discipline).
      .select(col("cnt"), explode_outer(adjacentPairs(col("syms"))).as("p"))
      .where(col("p").isNotNull)
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("cnt")).as("c"))
      .orderBy(col("c").desc, col("lhs").asc, col("rhs").asc)
      .limit(1)

  /** Train `k` merges. Each round collects exactly ONE row (the argmax
    * pair, ties broken by (count DESC, lhs ASC, rhs ASC) so both engines
    * agree); the max pair count is non-increasing across rounds (any new
    * pair contains the just-fused symbol, whose count is bounded by the
    * winning count). Stops early if the vocabulary runs out of pairs.
    */
  def trainMerges(docs: DataFrame, k: Int): Seq[Merge] = {
    val words0 = vocab(docs).barrier() // vocab-sized
    try trainMergesFrom(words0, k)
    finally Barrier.release(words0)
  }

  /** [[trainMerges]] + [[subwordBook]] over ONE corpus scan: the word
    * table is aggregated once and feeds both the merge rounds and the
    * book. Composed separately (the previous doc_subword_stats shape),
    * subwordBook(docs, …) re-tokenized and re-aggregated the whole
    * corpus a second time just to recover the identical vocab table
    * training had already built and released.
    */
  def trainMergesAndBook(docs: DataFrame, k: Int, maxVocab: Int = 4096)
      : (Seq[Merge], Map[String, Long]) = {
    // Entry validation (bookFrom re-checks for its other callers): a
    // deterministically-invalid maxVocab must fail BEFORE the corpus
    // scan and k training rounds are paid.
    require(maxVocab >= 1, s"maxVocab=$maxVocab must be >= 1")
    val words0 = vocab(docs).barrier()
    try {
      val merges = trainMergesFrom(words0, k)
      (merges, bookFrom(words0, merges, maxVocab))
    } finally Barrier.release(words0)
  }

  /** The k merge rounds over a CALLER-OWNED barriered word table — never
    * releases `words0` itself (both exit paths guard `ne words0`), so
    * the caller can keep reading it after training.
    */
  private def trainMergesFrom(words0: DataFrame, k: Int): Seq[Merge] = {
    require(k >= 1 && k <= 64, s"k=$k merge rounds outside [1, 64]")
    var words = words0
    val merges = Seq.newBuilder[Merge]
    // try/finally over the whole loop: the merges are driver data, so the
    // CURRENT vocab generation is dead on every exit — normal completion
    // AND a mid-round failure (Verify catches per-query exceptions and
    // keeps running; a success-only release would strand a vocab-sized
    // checkpoint for the rest of the session).
    try {
      var round = 1
      var exhausted = false
      while (round <= k && !exhausted) {
        val top = topPairPlan(words).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (lhs, rhs, c) = (top(0).getString(0), top(0).getString(1),
            top(0).getLong(2))
          merges += Merge(round, lhs, rhs, lhs + rhs, c)
          // No generation after the LAST recorded merge: the loop exits
          // on `round <= k` and nothing reads the final generation
          // (bookFrom replays the merges over words0), so building and
          // eagerly checkpointing it was one full applyMerge fold over
          // the vocabulary — ~1/k of the whole training cost — released
          // unread in finally.
          if (round < k) {
            val next = words
              .withColumn("syms", applyMerge(col("syms"), lhs, rhs))
              .barrier()
            // The new barrier is materialized (eager), so the superseded
            // generation's blocks can go now — otherwise a k-round loop
            // holds up to k vocab-sized checkpoints until driver GC.
            if (words ne words0) Barrier.release(words)
            words = next
          }
          round += 1
        }
      }
    } finally if (words ne words0) Barrier.release(words)
    merges.result()
  }

  /** The registered-query form: the learned merges as a k-row DataFrame
    * (merge_round, lhs, rhs, merged, pair_count).
    */
  def bpeMerges(spark: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    trainMerges(docs, k)
      .toDF("merge_round", "lhs", "rhs", "merged", "pair_count")
  }

  /** Subword count of a text under a learned merge table — the packing
    * budget unit `doc_packing_bpe` consumes: per word, apply the merges
    * in training order and count the surviving symbols. Map-only (nested
    * folds over literals); a null text counts 0 like an empty one.
    */
  def subwordCount(text: Column, merges: Seq[Merge]): Column =
    subwordCount(text, merges, Map.empty)

  /** The per-word merge fold — subword count of ONE word under the
    * learned merges.
    */
  private def perWordCount(w: Column, merges: Seq[Merge]): Column = {
    val fused = merges.foldLeft(charSyms(w)) { (s, m) =>
      applyMerge(s, m.lhs, m.rhs)
    }
    size(fused).cast("long")
  }

  /** [[subwordCount]] with a DRIVER-RESIDENT per-word count book: words
    * in the book resolve by one literal-map lookup; misses fall back to
    * the exact inline fold, so the result is IDENTICAL at any book
    * coverage (spec-pinned). The fold re-runs the full k-merge chain per
    * token INSTANCE — measured 6.4 s at sf0.1 where the corpus has 270k
    * instances of 31 distinct words; with the book the hot path is one
    * map probe and the query drops to training cost.
    */
  def subwordCount(text: Column, merges: Seq[Merge],
      book: Map[String, Long]): Column = {
    val perTok =
      if (book.isEmpty) (w: Column) => perWordCount(w, merges)
      else {
        // functions.map over sorted (key, value) literal pairs — NOT
        // typedLit(Map), whose no-TypeTag fallback rejects Map outright
        // (the Literal.apply Vector lesson); sorted so the expression is
        // deterministic across runs.
        val bookCol = map(book.toSeq.sortBy(_._1)
          .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        (w: Column) =>
          coalesce(element_at(bookCol, w), perWordCount(w, merges))
      }
    coalesce(
      aggregate(TextAnalysis.wsTokens(lower(text)), lit(0L),
        (acc, w) => acc + perTok(w)),
      lit(0L))
  }

  /** Per-word subword counts for the corpus's `maxVocab` most frequent
    * words, folded to a driver map (limit-before-collect; ties broken
    * (cnt DESC, word ASC) so the book is deterministic). ONE aggregation
    * over the vocabulary table runs the merge fold once per DISTINCT
    * word instead of once per instance; uncovered tail words (past the
    * cap, or a corpus the book wasn't built on) fall back to the inline
    * fold in [[subwordCount]].
    */
  def subwordBook(docs: DataFrame, merges: Seq[Merge],
      maxVocab: Int = 4096): Map[String, Long] =
    bookFrom(vocab(docs), merges, maxVocab)

  /** [[subwordBook]]'s tail over an existing word table — shared with
    * [[trainMergesAndBook]] so the single-scan path and the standalone
    * path cannot drift.
    */
  private def bookFrom(words: DataFrame, merges: Seq[Merge],
      maxVocab: Int): Map[String, Long] = {
    require(maxVocab >= 1, s"maxVocab=$maxVocab must be >= 1")
    words
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxVocab)
      .select(col("word"), perWordCount(col("word"), merges).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}
