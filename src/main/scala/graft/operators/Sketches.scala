package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Barrier.BarrierOps

/** Distributed frequency sketches.
  *
  * The first resident is the EXACT two-pass heavy-hitters recipe over a
  * bounded-memory Misra-Gries summary (Misra & Gries 1982, "Finding
  * repeated elements"; merge analysis in Berinde et al., PODS 2009 /
  * Agarwal et al., "Mergeable summaries"): pass 1 runs an independent
  * k-counter summary per partition and unions the surviving candidate
  * tokens; pass 2 recounts ONLY the candidates exactly and applies the
  * frequency threshold. The union is a provable superset of every token
  * with global count > N/(k+1): such a token must exceed N_p/(k+1) in at
  * least one partition (pigeonhole over Σ N_p = N), and a per-partition
  * MG summary with k counters retains every token above that partition
  * share. So the recount sees every qualifying token and the final
  * output is EXACT — sketch noise affects only how many false candidates
  * get recounted, never the result. That exactness is what makes the
  * operator oracle-checkable against a plain `HAVING cnt * k > total`.
  *
  * Why not `vocabTopK`'s full aggregation: a groupBy over raw tokens
  * carries the ENTIRE vocabulary through the exchange — fine at 31
  * distinct test tokens, ruinous at a 100 TB crawl's billions of
  * distinct (typo'd, numeric, concatenated) tokens. Here the exchange
  * after pass 1 moves ≤ k rows per partition, and pass 2's aggregation
  * state is bounded by the candidate set (≤ k × partitions + 1 groups),
  * independent of vocabulary size. Both passes scan the corpus once
  * each; nothing ever shuffles on the raw token stream.
  *
  * Relationship to [[Curation.vocabTopKSketch]]: same per-partition
  * kernel ([[misraGries]]), different contracts. The vocab sketch is
  * ONE pass returning ESTIMATED counts (lower bounds with a stated
  * error bound, partition-layout dependent, spec-pinned); this recipe
  * pays a second pass to return the EXACT threshold set, which is what
  * lets it carry a hash-checked oracle row.
  */
object Sketches {

  /** One Misra-Gries summary over an iterator: at most `capacity` live
    * counters plus the stream length. A tracked token increments; an
    * untracked token takes a free slot or triggers the decrement-all
    * step (the classic "cancel capacity+1 distinct occurrences" move —
    * each decrement round consumes one occurrence of every tracked
    * token plus the incoming one, so at most n/(capacity+1) rounds run
    * and a token with more occurrences than that can never be cancelled
    * to zero). Counter values are LOWER bounds with undercount
    * ≤ n/(capacity+1).
    *
    * THE per-partition kernel for both sketch consumers —
    * [[Curation.vocabSketchCandidates]] keeps the (token, lower-bound)
    * pairs for its mergeable-summaries estimate; [[heavyTokens]] keeps
    * only the key set as its exact-recount candidates. One
    * implementation so the overflow discipline cannot drift between
    * them.
    */
  private[graft] def misraGries(it: Iterator[String], capacity: Int)
      : (scala.collection.mutable.HashMap[String, Long], Long) = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val t = it.next(); n += 1
      counts.get(t) match {
        case Some(c) => counts.update(t, c + 1)
        case None if counts.size < capacity => counts.update(t, 1L)
        case None =>
          // decrement-all; drop zeroed counters to free slots
          val dead = List.newBuilder[String]
          counts.foreach { case (key, c) =>
            if (c == 1L) dead += key else counts.update(key, c - 1)
          }
          dead.result().foreach(counts.remove)
      }
    }
    (counts, n)
  }

  /** The candidate KEY set of a summary — counter values under-estimate
    * and must not leave pass 1 of the exact recipe.
    */
  private[graft] def misraGriesKeys(it: Iterator[String], k: Int)
      : Iterator[String] =
    misraGries(it, k)._1.keysIterator

  /** Above this many candidates, pass 2 switches from an In-set literal
    * predicate to a broadcast hash join: OptimizeIn turns the isin into
    * an InSet so it PLANS at any size, but the full literal set rides
    * inside the serialized plan of every task — megabytes of predicate
    * per task once k × partitions reaches the hundreds of thousands. A
    * broadcast table ships ONCE per executor instead and the probe
    * stays a map-side hash lookup, so the corpus still never shuffles
    * on raw tokens.
    */
  private[graft] val InSetLiteralMax = 1 << 15

  /** Pass 2's aggregation, factored for the plan lock (the barrier that
    * follows it hides the subtree from the final query's plan): every
    * token folds to itself if it is a candidate and to NULL otherwise —
    * NULL is the "not a candidate" bucket, which no sentinel string can
    * collide with and groupBy folds together — then ONE hash
    * aggregation counts the ≤ |candidates|+1 groups. Small candidate
    * sets probe via a codegen'd In-set predicate riding the scan's
    * projection; sets past [[InSetLiteralMax]] probe via a broadcast
    * LEFT join (same fold, same groups — spec-pinned equal). Either
    * way the exchange moves only the folded groups.
    */
  private[graft] def candidateCounts(toks: DataFrame,
      candidates: Seq[String],
      inSetMax: Int = InSetLiteralMax): DataFrame = {
    // Scratch-name guard (the Skew/RangeJoin convention): the join
    // branch introduces __cand onto the caller's frame, and a frame
    // already carrying __cand (or the output name g) would fail with
    // AMBIGUOUS_REFERENCE — or silently fold wrong — instead of this
    // loud precondition.
    Skew.requireScratchFree(toks, Seq("__cand", "g"),
      "Misra-Gries candidate recount")
    val folded =
      if (candidates.size <= inSetMax)
        toks.select(
          when(col("tok").isin(candidates: _*), col("tok")).as("g"))
      else {
        val spark = toks.sparkSession
        import spark.implicits._
        // Defensive distinct (driver-side, tiny): a duplicate candidate
        // would be harmless in the In-set form but would DUPLICATE rows
        // through the join form.
        val cand = broadcast(candidates.distinct.toDF("__cand"))
        toks.join(cand, col("tok") === col("__cand"), "left")
          .select(when(col("__cand").isNotNull, col("tok")).as("g"))
      }
    folded.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
  }

  /** Hard driver-side bound on the collected candidate set: k counters
    * PER PARTITION union up, so k alone does not bound the collect — a
    * large k over many partitions must fail loudly, not OOM the driver
    * or plan a multi-million-literal In set (the limit-before-collect
    * discipline of embDecontam/bigramLmModel).
    */
  private val MaxCandidates = 1 << 20

  /** Tokens with whitespace-token frequency STRICTLY greater than
    * total/k, with exact counts and the floor-quantized corpus share.
    *
    * Pass 1 (one corpus scan): per-partition [[misraGriesKeys]] via
    * `mapPartitions`, candidates collected to the driver — bounded by
    * k × partitions rows and the hard [[MaxCandidates]] cap, the same
    * driver-literal discipline as the centroid books
    * (Similarity.trainKeyedBooks).
    * Pass 2 (one corpus scan): [[candidateCounts]]' single folded-group
    * aggregation; the corpus total rides the same aggregation as the
    * sum over all groups (including the NULL "other" bucket), so no
    * third scan computes it. The threshold compare is integer
    * (`cnt * k > total`) — no division, no float.
    *
    * Output is independent of partitioning: the summary only decides
    * which tokens get RECOUNTED, and the recount is exact — MG state
    * itself is partition-order dependent and must never be emitted.
    *
    * DETERMINISTIC-INPUT precondition (the ExactDedupIndex scan rule):
    * the two passes re-evaluate `docs` independently, so the input must
    * re-evaluate to the same rows — true for any source scan; salt or
    * barrier anything else (Skew.withSalt). A frame that changes
    * between the passes can surface a token in pass 2 that pass 1's
    * candidate sweep never saw — silently folded into the "other"
    * bucket, breaking the EXACT claim with no error anywhere.
    */
  def heavyTokens(spark: SparkSession, docs: DataFrame, k: Int = 50)
      : DataFrame = {
    import spark.implicits._
    require(k >= 1 && k <= 100000, s"k=$k outside [1, 100000]")
    // explodedTokens, not explode(wsTokens(...)): the inner explode of
    // the raw expression lets InferFiltersFromGenerate re-run the regex
    // tokenization inside an inferred filter — and this operator scans
    // the corpus twice, so the tax would be paid on both passes.
    val toks = TextAnalysis.explodedTokens(docs, as = "tok")
      .select(col("tok"))
    val candidates = toks.as[String]
      .mapPartitions(it => misraGriesKeys(it, k))
      .distinct().limit(MaxCandidates + 1).collect().toSeq
    require(candidates.size <= MaxCandidates,
      s"heavy-hitter candidate set exceeds $MaxCandidates (k=$k over " +
        "too many partitions) — lower k or coalesce the input")
    // Empty corpus: nothing can be heavy, and isin() over an empty list
    // is not a valid predicate — return the empty contract frame.
    if (candidates.isEmpty)
      return Seq.empty[(String, Long, Double)]
        .toDF("token", "cnt", "share")
    val grouped = candidateCounts(toks, candidates)
      .barrier() // tiny (≤ candidates+1 rows); two branches below read it
    // The (even tinier) final result materializes eagerly so grouped's
    // checkpoint blocks release NOW, in finally — a lazily-read barrier
    // could never be released and would strand blocks per invocation
    // across a Verify/bench suite (this session's leak discipline).
    try {
      val total = grouped.agg(sum(col("cnt")).as("__total"))
      grouped.where(col("g").isNotNull)
        .crossJoin(broadcast(total))
        // decimal(38,0) product (the pmiTopK widening rule): cnt can
        // approach total, so cnt·k in Long overflows at ~9.3e13 tokens
        // × k=1e5 — ANSI would abort the query, non-ANSI would wrap
        // negative and silently drop every heavy token.
        .where(col("cnt").cast("decimal(38,0)") * lit(k.toLong) >
          col("__total"))
        .select(col("g").as("token"), col("cnt"),
          Quant.q6(col("cnt").cast("double") / col("__total").cast("double"))
            .as("share"))
        .barrier()
    } finally Barrier.release(grouped)
  }
}
