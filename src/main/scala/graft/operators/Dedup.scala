package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Barrier.BarrierOps

/** Deduplication operators over the `documents` table: exact (hash group),
  * MinHash + LSH (shingle → signature → band → bucket join → verify),
  * SimHash, and n-gram Jaccard verification — the standard near-dup
  * pipeline for training-data curation (BASELINE.json north star).
  *
  * Scale design:
  *  - Exact dedup groups on md5(text) — the shuffle carries a 32-char hash,
  *    never the document body.
  *  - MinHash signatures come from ONE pass over exploded shingles with k
  *    conditional `min` aggregates (no seed-multiplication of rows); the
  *    shuffle key is doc_id.
  *  - Candidate generation self-joins the *band bucket* table (rows = docs
  *    × bands, tiny), never the corpus; verification joins shingle sets
  *    only for candidate pairs.
  *  - All hashes are md5 (bit-identical in any engine) so every stage of
  *    the pipeline — including the hash-seeded MinHash itself — is
  *    oracle-verifiable in ANSI SQL.
  */
object Dedup {

  // ---- exact dedup ------------------------------------------------------

  /** Exact-duplicate groups: one row per distinct text with the canonical
    * (minimum) doc_id and the duplicate count.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    exactGroupsFromHashes(
      // md5(coalesce): the null ≡ empty contract — md5(NULL) is NULL and
      // would keep null-text docs in their own group, diverging from
      // both the oracle (md5(coalesce(text, ''))) and Curation's
      // exact-dup family.
      docs.select(col("doc_id"),
        md5(coalesce(col("text"), lit(""))).as("text_hash")))

  /** [[exactGroups]] from pre-computed (`doc_id`, `text_hash`) rows — the
    * canonical-keeper rule (min doc_id per hash) lives HERE only, so
    * pipelines that hash once up front (see [[Curation.curationReport]])
    * share it instead of re-stating it.
    *
    * NULL doc_id contract (the samplers' rule, applied family-wide): a
    * no-identity doc is EXCLUDED up front — it cannot be "kept by id",
    * must not occupy the canonical slot, and must not inflate a group's
    * `dup_count` (under the old skip-at-MIN behavior a group whose
    * members ALL lacked identity emitted keep_id NULL, and engines only
    * agreed on that shape by the accident of matching MIN/COUNT null
    * skipping). The filter is mirrored in the `doc_exact_dedup` oracle,
    * [[Curation.curationReport]]'s shared hash stage (which already
    * filtered for join-attribution reasons), and
    * [[Curation.streamingExactDedup]] — the four pieces move together
    * (spec-pinned).
    */
  def exactGroupsFromHashes(hashes: DataFrame): DataFrame =
    hashes.where(col("doc_id").isNotNull)
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** The deduplicated corpus: keep the min doc_id per distinct text. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keep = exactGroups(docs).select(col("keep_id"))
    docs.join(keep, docs("doc_id") === keep("keep_id"), "left_semi")
  }

  // ---- shingling --------------------------------------------------------

  /** Shingle array from a PRE-MATERIALIZED token-array column. The token
    * column must be a plain attribute (see [[shingleSets]]): `element_at`
    * references it 3× per gram inside the `transform` lambda, and the
    * interpreted HOF path re-evaluates the lambda's free subexpressions per
    * element — inlining the regex tokenization here cost ~160 tokenizations
    * per document (9.4 s of the 11.5 s sf0.1 minhash bench entry).
    */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column = {
    // Loud width guard (the winnowingFingerprints k-rule): n = 0 makes
    // `size(toks) >= n` true for the EMPTY array too, so every document
    // — blank and null-text included — would shingle to the single
    // zero-token gram "" and the pair paths would emit the jaccard-1.0
    // all-docs quadratic clique the empty-set contract exists to
    // prevent, with no error anywhere.
    require(n >= 1, s"shingle width n=$n must be >= 1")
    // Token-less documents shingle to the EMPTY set — not to [""]: with
    // the [""] fallback every blank/null doc was a jaccard-1.0 "near
    // duplicate" of every other blank doc, a semantically-wrong
    // quadratic clique on one hot LSH key at crawl scale (f blank docs
    // → O(bands·f²) bucket join rows). Empty sets simply exit the pair
    // pipelines (no shingles ⇒ no signature, no candidates, no counts).
    // ONE codegen kernel (graft.functions.ShinglesExpr, r18) for the
    // gram build + short-doc fallbacks + first-occurrence distinct —
    // the former array_distinct(when(...ngramArray...)) chain evaluated
    // the gram transform interpreted per element under every minhash /
    // prefix-join / decontamination consumer (equivalence spec-pinned
    // incl. the blank-doc empty-set and whole-text-fallback contracts).
    graft.functions.TextFunctions.shingles(toks, n)
  }

  /** Distinct word-`n`-gram shingles per document; documents shorter than
    * `n` tokens contribute their whole text as one shingle. Convenience
    * single-Column form — prefer [[shingleSets]] in query plans (it keeps
    * the tokenization out of the gram lambda).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(TextAnalysis.wsTokens(text), n)

  /** (doc_id, sset) shingle sets with the tokenization materialized in its
    * own projection. CollapseProject leaves the barrier in place because
    * `toks` is non-cheap and referenced from multiple sites, so the regex
    * split runs exactly once per document.
    */
  def shingleSets(docs: DataFrame, n: Int = 3): DataFrame =
    shingleSetsFromTokens(
      docs.select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks")),
      n)

  /** (doc_id, sset) from an already-tokenized (`doc_id`, `toks`) table —
    * the entry point for pipelines that tokenize the corpus once and fan
    * out (see [[Curation.curationReport]]). `toks` must be an attribute,
    * which a pre-materialized table guarantees.
    */
  def shingleSetsFromTokens(toksDf: DataFrame, n: Int = 3): DataFrame =
    toksDf.select(col("doc_id"), shinglesFromTokens(col("toks"), n).as("sset"))

  /** (doc_id, shingle) exploded pairs — the unit of MinHash work.
    *
    * `explode_outer`, deliberately: inner `explode` triggers Catalyst's
    * InferFiltersFromGenerate, which pushes a `size(sset) > 0` filter BELOW
    * the shingle projection — alias substitution inlines the whole gram
    * `transform` into the filter with the tokenization inside every
    * `element_at`, so each document re-runs the regex split 8× PER GRAM
    * (measured: 25 s of a 48 s query at sf0.1; the projection itself is
    * ~1 s). The outer variant skips the rule; token-less docs carry an
    * EMPTY sset (see [[shinglesFromTokens]]), whose outer explode emits
    * one null-shingle row — filtered on the exploded ATTRIBUTE, which
    * cannot re-trigger the inference (the filter sits above the
    * generate, not below it; plan-locked).
    */
  def explodedShingles(docs: DataFrame, n: Int = 3): DataFrame =
    explodedFromSets(shingleSets(docs, n))

  /** The InferFiltersFromGenerate-safe shingle explode from a PRE-BUILT
    * (doc_id, sset) table — the outer + isNotNull rule lives ONCE here,
    * so set-table consumers (the persisted dedup index's build and both
    * serve legs) cannot drift back to the inner form a future "cleanup"
    * would reach for (the measured cost is documented above).
    */
  private[graft] def explodedFromSets(sets: DataFrame): DataFrame =
    sets.select(col("doc_id"), explode_outer(col("sset")).as("shingle"))
      .where(col("shingle").isNotNull)

  // ---- MinHash + LSH ----------------------------------------------------

  /** Number of hash functions and LSH band width: k = bands * rows. */
  val MinhashK = 8
  val BandRows = 2
  val Bands: Int = MinhashK / BandRows

  /** Hash function family: TWO md5s per shingle (seeds 'a:'/'b:'), each
    * sliced into four 8-hex-char (32-bit) values → 8 functions, compared
    * lexicographically (any total order works for MinHash; hex strings give
    * one that every engine agrees on). One md5 per seed per shingle was the
    * dominant cost of the whole near-dup pipeline — slicing a strong hash
    * buys k functions for the price of two, and 32-bit values collide with
    * negligible probability across a document's shingle set.
    */
  private def slice(m: Column, i: Int): Column = substring(m, i * 8 + 1, 8)

  /** MinHash signatures from exploded (doc_id, shingle) pairs: one row per
    * doc, columns h0..h{k-1} — hash per ROW first (so each md5 is computed
    * once, not once per aggregate), then a single aggregation with k mins.
    */
  private[graft] def signaturesFromExploded(ex: DataFrame): DataFrame = {
    val hashed = ex.select(col("doc_id"),
      md5(concat(lit("a:"), col("shingle"))).as("ma"),
      md5(concat(lit("b:"), col("shingle"))).as("mb"))
    hashed.groupBy(col("doc_id"))
      .agg(
        min(slice(col("ma"), 0)).as("h0"),
        ((1 until 4).map(i => min(slice(col("ma"), i)).as(s"h$i")) ++
          (0 until 4).map(i => min(slice(col("mb"), i)).as(s"h${i + 4}"))): _*)
  }

  def signatures(docs: DataFrame, n: Int = 3): DataFrame =
    signaturesFromExploded(explodedShingles(docs, n))

  /** LSH band buckets: (doc_id, band, key) where key = md5 of the band's
    * signature slice. Docs sharing any (band, key) are candidates.
    */
  private[graft] def bandBucketsFromSignatures(sig: DataFrame): DataFrame = {
    val bands = (0 until Bands).map { b =>
      val cols = (b * BandRows until (b + 1) * BandRows).map(i => col(s"h$i"))
      struct(lit(b).as("band"), md5(concat(cols: _*)).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  def bandBuckets(docs: DataFrame, n: Int = 3): DataFrame =
    bandBucketsFromSets(shingleSets(docs, n))

  /** (doc_id, band, key) LSH bucket rows computed PER ROW with the shared
    * [[bandKeyArray]] kernel (the streaming twins' signature path) —
    * map-only: no shingle-row explode, no doc_id-keyed signature
    * exchange. Identical output to the explode + groupBy-of-mins
    * pipeline by the kernel's contract (array_min over the per-shingle
    * md5 arrays ≡ the batch min aggregation; multiset-equality
    * spec-pinned), measured 2.2× faster at sf0.1 AND one full corpus
    * exchange cheaper at scale — the r17 guide-§2.4 rewrite.
    *
    * Discipline notes: `ma`/`mb` materialize as attributes in their own
    * projection (bandKeyArray's contract; CollapseProject keeps the
    * non-cheap multi-referenced `sset` out of the lambdas); the explode
    * is the OUTER + isNotNull form (an inner posexplode would re-inline
    * the whole band algebra into an inferred filter — the
    * InferFiltersFromGenerate class). The batch pipeline's
    * no-rows-for-shingle-less-docs contract rides the SAME isNotNull:
    * an empty sset folds to all-NULL band keys (array_min([]) = NULL,
    * concat/md5 null-propagate), so the key filter drops those rows —
    * deliberately NOT a `size(sset) >= 1` pre-filter, which predicate
    * pushdown would substitute below the set projection and re-run the
    * whole shingle expression per row when `sets` is unmaterialized
    * (measured 5× on doc_fuzzy_pairs; a filter on a GENERATED attribute
    * cannot be pushed below its Generate, so this form is safe for
    * barriered and lazy inputs alike).
    */
  private[graft] def bandBucketsFromSets(sets: DataFrame): DataFrame =
    // The whole per-row signature+banding algebra is ONE codegen kernel
    // since r18 (graft.functions.BandKeysExpr — two seeded digests per
    // shingle, four band mins, four band-key digests, native): the
    // former ma/mb md5 transforms evaluated interpreted per shingle.
    // Kernel ≡ bandKeyArray(ma, mb) spec-pinned; the explode stays the
    // OUTER + isNotNull form (the InferFiltersFromGenerate rule).
    sets.select(col("doc_id"),
        posexplode_outer(
          graft.functions.TextFunctions.bandKeys(col("sset")))
          .as(Seq("band", "key")))
      .where(col("key").isNotNull)

  /** The PER-ROW (Column) form of the signature + banding algebra, for
    * consumers that cannot shuffle — the streaming index twin computes
    * a doc's band keys in a stateless map. `ma`/`mb` must be
    * MATERIALIZED attributes holding the per-shingle md5 arrays
    * (seeds 'a:'/'b:'): min over an array equals the batch
    * groupBy-of-mins over the same exploded values, and the slice/band
    * layout is THIS one definition — a second hand-written copy of the
    * `b*2`/`b*2+1` arithmetic desynchronized the twins the moment
    * MinhashK/BandRows changed (the deleted-Scala-signature-twin
    * lesson).
    */
  private[graft] def bandKeyArray(ma: Column, mb: Column): Column = {
    def h(src: Column, i: Int): Column =
      array_min(transform(src, m => slice(m, i)))
    val hs = (0 until 4).map(i => h(ma, i)) ++ (0 until 4).map(i => h(mb, i))
    // Concat the FULL BandRows slice range (identical expression at the
    // current BandRows = 2): the previous hardcoded two-element concat
    // compiled fine under any BandRows while the batch banding used the
    // full slice — exactly the silent stream≡batch desync this helper's
    // single-definition contract exists to prevent.
    array((0 until Bands).map(b =>
      md5(concat((b * BandRows until (b + 1) * BandRows).map(hs): _*))): _*)
  }

  /** The r6-quantized Jaccard from an intersection count and the two set
    * sizes — ONE Column definition for every pair verifier (batch LSH
    * verify, exact-pairs baseline, both dedup-index serve legs, the
    * streaming index twin). The round-8 lesson: a quantization change
    * applied to one hand-copied site silently split stream ≡ batch at
    * .5-grid rationals. (The typed-state streaming path keeps its
    * documented SCALA twin, StreamingNearDup.jaccardOf — it cannot call
    * a Column.)
    */
  private[graft] def jaccardCol(inter: Column, na: Column,
      nb: Column): Column =
    Quant.r6(inter.cast("double") / (na + nb - inter).cast("double"))

  /** Optional hot-key cap for the pair-generating self-joins (LSH bands,
    * SimHash blocks, shingle df): drop every key shared by more than
    * `cap` documents before the join. An f-sized EXACT-duplicate cluster
    * (identical signatures ⇒ identical band/block keys) contributes
    * O(bands·f²) join rows on a handful of hot keys. One-sided bounded
    * undercount like every df cap here: pairs inside a dropped bucket
    * can only be MISSED, never invented (and an exact-dup cluster is
    * better handled by [[exactDedup]] FIRST — this cap is the seatbelt
    * for pipelines that skip it). Default 0 = uncapped (oracle parity).
    */
  private def capHotKeys(df: DataFrame, keys: Seq[String],
      cap: Int): DataFrame =
    if (cap <= 0) df
    else {
      val hot = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") > cap)
        .select(keys.map(col): _*)
      // No broadcast hint: the hot set is bounded only by corpus
      // duplication; AQE broadcasts it when it is actually small.
      df.join(hot, keys, "left_anti")
    }

  /** The candidate self-join over a bucket table the CALLER has already
    * materialized — both join sides read `bk`, so an unmaterialized
    * input would re-plan the whole signature subtree (shingle explode +
    * 2 md5s/shingle + k-min aggregation) per side. No barrier here: an
    * unconditional one re-checkpointed callers' already-materialized
    * tables into unreleasable copies (the DedupIndex serve leaked one
    * per invocation until this was hoisted to the callers).
    */
  private def candidatePairsFromBuckets(bk: DataFrame): DataFrame = {
    val l = bk.as("l"); val r = bk.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Candidate pairs (a < b) from shared LSH buckets — eagerly
    * materialized so the bucket barrier can release on exit.
    */
  def candidatePairs(docs: DataFrame, n: Int = 3): DataFrame = {
    val bk = bandBuckets(docs, n).barrier()
    try candidatePairsFromBuckets(bk).barrier()
    finally Barrier.release(bk)
  }

  /** Bounded-edit-distance near-duplicate pairs: every LSH-candidate pair
    * whose full-text Levenshtein distance is ≤ `maxDist`. Output:
    * (doc_a, doc_b, dist) with doc_a < doc_b.
    *
    * The fuzzy-match / record-linkage primitive: MinHash banding proposes
    * candidates (recall bounded by the LSH family — a pair must collide
    * in at least one band; NO all-pairs product ever forms), a length
    * prune discards candidates whose size difference alone proves
    * dist > maxDist (|len(a)−len(b)| lower-bounds edit distance), and
    * only the survivors pay the O(len·maxDist) banded DP —
    * `levenshtein(a, b, threshold)` short-circuits to −1 past the bound
    * rather than filling the full O(len²) matrix.
    *
    * 100 TB shape: two hash joins of the (small, materialized) candidate
    * table against the corpus on doc_id; text moves only for candidate
    * rows, never through the bucket explode.
    */
  def fuzzyPairs(docs: DataFrame, n: Int = 3, maxDist: Int = 8): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist must be >= 0")
    val cand = candidatePairs(docs, n)
    try {
      // ONE corpus text scan (r18): both verify joins used to stream
      // the corpus's text column independently (two full scans). The
      // candidate ids — LSH-bounded, the same table the joins already
      // consume broadcast — semi-filter a text SLIVER map-side, and
      // both joins read the materialized sliver instead.
      val ids = cand.select(col("doc_a").as("doc_id"))
        .unionByName(cand.select(col("doc_b").as("doc_id")))
        .distinct()
      val sliver = docs.select(col("doc_id"), col("text"))
        .join(broadcast(ids), Seq("doc_id"), "left_semi")
        .barrier()
      try fuzzyVerify(cand, sliver, maxDist)
        .barrier() // eager result; the scratch barriers release below
      finally Barrier.release(sliver)
    } finally Barrier.release(cand)
  }

  /** [[fuzzyPairs]]' verify tail, factored for the plan lock (the result
    * barrier hides it): two id hash joins, the length prune, the banded
    * DP.
    */
  private[graft] def fuzzyVerify(cand: DataFrame, txt: DataFrame,
      maxDist: Int): DataFrame =
    cand
      .join(txt.select(col("doc_id").as("doc_a"), col("text").as("ta")),
        Seq("doc_a"))
      .join(txt.select(col("doc_id").as("doc_b"), col("text").as("tb")),
        Seq("doc_b"))
      .filter(abs(length(col("ta")) - length(col("tb"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("ta"), col("tb"), maxDist).cast("long"))
      .filter(col("dist") >= 0) // threshold form returns −1 past bound
      .select(col("doc_a"), col("doc_b"), col("dist"))

  /** MinHash-LSH near-duplicates: candidates verified by exact shingle-set
    * Jaccard >= `threshold`. Output: (doc_a, doc_b, jaccard).
    *
    * The shingle-set subtree feeds three plan branches (signatures, and
    * both sides of the verify join); persisting it computes the text →
    * shingles parse once instead of per branch.
    */
  def minhashNearDups(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.5, maxBucketDf: Int = 0): DataFrame = {
    // Guard parity with prefixJaccardPairs (the one member that already
    // validated): threshold = 0 admits every bucket collision silently,
    // > 1 returns empty with no error.
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold outside (0, 1]")
    // Per-doc null-id rule at the PAIR-chain entry (oracle-mirrored):
    // a NULL-keyed frankendoc signature could never pair (doc_a < doc_b
    // rejects NULL) but its band keys DID weigh into the maxBucketDf
    // census — the latent cap-boundary divergence class — and the whole
    // shingle+signature pipeline ran for it. The drop sits HERE, not in
    // shingleSets: the decontamination chains deliberately keep null-id
    // docs' grams (a null-id train doc leaks grams but counts as zero
    // docs — spec-pinned in doc_leak_report).
    // r18-cont rebalance (measured, sf0.1: 1.15 s cached vs 0.99 s
    // uncached): the kernel shingle pipeline re-runs once per consumer
    // (banding + both verify-join sides) cheaper than the persist of
    // the corpus-sized set table it replaced.
    minhashNearDupsFromSets(
      shingleSets(docs.where(col("doc_id").isNotNull), n),
      threshold, maxBucketDf)
  }

  /** [[minhashNearDups]] from a pre-built (doc_id, sset) table. The caller
    * owns `sets`' lifecycle: three plan branches read it, but a LAZY
    * kernel-built set table is fine (recompute measured cheaper than a
    * persist since r18 — see minhashNearDups); callers holding the sets
    * at rest (curationReport's parquet scratch) read from storage. The
    * pair table comes back eagerly materialized.
    */
  private[graft] def minhashNearDupsFromSets(sets: DataFrame,
      threshold: Double = 0.5, maxBucketDf: Int = 0): DataFrame = {
    // With a cap, the bucket table feeds BOTH capHotKeys' hot-key
    // aggregation and the anti-join probe side — unbarriered, the whole
    // per-row signature pipeline would run twice (the
    // simhashNearDupsImpl discipline). Released below once the pair
    // table is materialized.
    val buckets0 = bandBucketsFromSets(sets)
    val buckets = if (maxBucketDf > 0) buckets0.barrier() else buckets0
    // The bucket barrier is released in finally: Verify/Bench catch a
    // per-query failure and continue the suite, so a release only on the
    // success path would strand the bucket table's checkpoint blocks for
    // the rest of the session (the dupClusters failure-path pattern).
    try {
      verifiedLshPairs(sets,
        capHotKeys(buckets, Seq("band", "key"), maxBucketDf), threshold)
    } finally if (maxBucketDf > 0) Barrier.release(buckets)
  }

  /** The candidate-join + Jaccard-verify tail over a PRE-BUILT bucket
    * table — shared by [[minhashNearDupsFromSets]] and
    * [[DedupIndex.dedupIndexPairs]]' within-batch pass, which already
    * built (and materialized) the delta's buckets for its index probe
    * and must not run the whole signature pipeline a second time (the
    * capHotKeys double-pipeline lesson). Returns eagerly materialized
    * pairs. `bucketsMaterialized = true` when `bk0` is (a projection
    * of) an existing barrier — re-barriering would checkpoint an
    * unreleasable second copy per call; otherwise this materializes
    * the buckets itself and releases them in finally.
    */
  private[graft] def verifiedLshPairs(sets: DataFrame, bk0: DataFrame,
      threshold: Double, bucketsMaterialized: Boolean = false): DataFrame = {
    val bk = if (bucketsMaterialized) bk0 else bk0.barrier()
    try verifiedLshPairsOver(sets, bk, threshold)
    finally if (!bucketsMaterialized) Barrier.release(bk)
  }

  private def verifiedLshPairsOver(sets: DataFrame, bk: DataFrame,
      threshold: Double): DataFrame = {
    val pairs = candidatePairsFromBuckets(bk)
    val j = pairs
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("inter", size(array_intersect(col("sa.sset"), col("sb.sset"))))
      .withColumn("jaccard",
        // inter/union is a small-integer rational — the measured round()
        // cross-engine divergence class, and it feeds the >= threshold
        // membership filter; jaccardCol's Quant.r6 is engine-order-free.
        jaccardCol(col("inter"), size(col("sa.sset")), size(col("sb.sset"))))
    // Materialize eagerly (the pair set is tiny relative to the corpus) so
    // the caller can release its shingle cache — persist() without
    // unpersist() would accumulate cached copies across a query suite.
    j.filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .barrier()
  }

  /** Exact n-gram Jaccard for ALL pairs sharing at least one shingle —
    * the non-approximate (quadratic-in-collisions) baseline that MinHash
    * approximates. Joining on the shingle itself bounds the blow-up to
    * genuinely-overlapping pairs.
    *
    * VERIFICATION-SCALE ONLY at the default settings (see
    * SparkEntry.verificationScaleOnly; the production near-dup path is
    * MinHash+LSH): a boilerplate shingle shared by f documents still
    * contributes f² join rows. `maxDf > 0` enables the hot-shingle cap
    * a scale run needs — shingles appearing in more than `maxDf`
    * documents are dropped BEFORE the pair join, which retires the f²
    * term. The error is one-sided and bounded: set sizes stay the
    * originals, so dropping a shared shingle lowers `inter` by one and
    * raises the union term by one — a pair's Jaccard can only DECREASE
    * (by at most its count of capped shared shingles over the union);
    * pairs are under-reported near the threshold, never over-reported,
    * and a ubiquitous shingle carries no dedup signal anyway.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.3, maxDf: Int = 0): DataFrame = {
    // Guard + null-id rules: see minhashNearDups (a zero threshold
    // additionally flips the size-ratio prune multiplier negative here,
    // admitting every size-incompatible pair into the self-join).
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold outside (0, 1]")
    // Join on the shingle's 64-bit hash: 8-byte shuffle keys instead of
    // full n-gram strings (identical counts — a 64-bit collision among
    // a corpus's distinct shingles is negligible). The LAZY set subtree
    // feeds the exploded join input and both count branches — recompute
    // per consumer measured cheaper than the persist it replaced (the
    // r18-cont kernel rebalance; see minhashNearDups).
    // Each exploded row carries its doc's shingle count so the join can
    // prune size-incompatible pairs in place: J(A,B) <= min/max, so a
    // pair whose size ratio sits below the threshold can never pass the
    // final filter — at corpus scale this drops most boilerplate
    // collisions before they reach the pair aggregation. The prune runs
    // against threshold − 1e-6, NOT the threshold itself: the final
    // filter compares round(J, 6), which admits true J down to half a
    // 1e-6 grid step below the threshold, and an exact-bound prune would
    // drop such a pair before the filter ever saw it.
    locally {
      val sets = shingleSets(docs.where(col("doc_id").isNotNull), n)
      val ex0 = sets.select(col("doc_id"), explode(col("sset")).as("shingle"),
          size(col("sset")).as("cnt"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("sh"), col("cnt"))
      // Hot-shingle cap via the ONE capHotKeys helper (shingle sets are
      // per-doc distinct, so count(*) per hash IS the document
      // frequency) — this block was a verbatim inline copy of it.
      val ex = capHotKeys(ex0, Seq("sh"), maxDf)
      val counts = sets.select(col("doc_id"), size(col("sset")).as("cnt"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
            least(col("a.cnt"), col("b.cnt")).cast("double") >=
              lit(threshold - 1e-6) * greatest(col("a.cnt"), col("b.cnt")))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
        .withColumn("jaccard",
          jaccardCol(col("inter"), col("ca.cnt"), col("cb.cnt")))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .barrier() // pair-set-sized result, eagerly materialized
    }
  }

  /** The prefix-filter chain over a materialized shingle-set table,
    * factored for the plan lock ([[prefixJaccardPairs]] barriers its
    * result, which would hide the join shape). See the public operator
    * for semantics and the completeness argument.
    */
  private[graft] def prefixJaccardOver(sets: DataFrame,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Grid slack mirrors ngramJaccardPairs: the final filter compares
    // r6(J) >= threshold, which admits true J down to half a 1e-6 step
    // below it — candidate pruning must use the relaxed bound or it
    // would drop exactly those pairs before the filter saw them.
    val tEff = threshold - 1e-6
    val ex = sets.select(col("doc_id"), explode(col("sset")).as("shingle"),
        size(col("sset")).cast("long").as("cnt"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"), col("cnt"))
    // Per-doc distinct shingles make count(*) the document frequency.
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    // Rarest-first prefix: p = |s| − ceil(t'·|s|) + 1 tokens. Only
    // prefix rows enter the pair join — the boilerplate shingles that
    // make the full self-join quadratic are, by construction of the
    // df-ascending order, the LAST to qualify.
    // BARRIERED before feeding both sides of the candidate self-join
    // (the candidatePairsFromBuckets rule): the explode + df aggregation
    // + rank window subtree would otherwise re-plan per side, and
    // exchange reuse is a runtime maybe, not a guarantee. Ownership
    // passes to the returned frame (the lshNearDups convention; callers
    // that materialize the result release nothing extra — the blocks
    // free with the frame).
    val prefix = ex.join(dfreq, Seq("sh"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= col("cnt") - ceil(lit(tEff) * col("cnt")) + lit(1))
      .select(col("doc_id"), col("sh"), col("cnt"), col("rn"))
      .barrier()
    // PPJoin positional bound on top of the prefix filter: J >= t forces
    // inter >= α := ceil(t·(|A|+|B|)/(1+t)), and the FIRST shared
    // element in the global order — provably inside BOTH prefixes (the
    // completeness argument) — bounds the remaining overlap by
    // min(|A|−i, |B|−j)+1 from its positions. The pair survives only if
    // its BEST match row's bound reaches α (max over match rows ≥ the
    // first match's bound ≥ inter ≥ α for true pairs — still complete).
    // Measured: 596k → 325k candidates at t=0.3, sf0.1.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.cnt"), col("b.cnt")).cast("double") >=
            lit(tEff) * greatest(col("a.cnt"), col("b.cnt")))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.cnt").as("ca"), col("b.cnt").as("cb"))
      .agg(max(least(col("a.cnt") - col("a.rn"),
        col("b.cnt") - col("b.rn")) + lit(1)).as("ub"))
      .where(col("ub") >=
        ceil(lit(tEff) * (col("ca") + col("cb")) / lit(1.0 + tEff)))
      .select(col("doc_a"), col("doc_b"))
    // Verify on SORTED HASH arrays with the codegen'd two-pointer merge
    // (`SortedLongIntersectCount`): per-pair `array_intersect` over the
    // string sets builds and probes a hash set per candidate — measured
    // 7.6 s for 600k candidates at sf0.1 vs 3.2 s on hashed arrays and
    // under 1 s with the fused merge walk. Distinct-count semantics
    // equal `size(array_intersect)` exactly (spec-pinned); 64-bit
    // collisions are the baseline join's own negligible caveat.
    val hsets = sets.select(col("doc_id"),
      array_sort(transform(col("sset"), s => xxhash64(s))).as("hs"),
      size(col("sset")).cast("long").as("n"))
    cand
      .join(hsets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(hsets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("inter", graft.functions.VectorFunctions
        .sortedIntersectCount(col("sa.hs"), col("sb.hs")))
      .withColumn("jaccard",
        jaccardCol(col("inter"), col("sa.n"), col("sb.n")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** EXACT Jaccard pairs WITHOUT the all-pairs join: prefix filtering
    * (AllPairs / PPJoin — Bayardo et al. 2007, Xiao et al. 2008). Every
    * pair with J ≥ threshold shares a shingle among each side's
    * `|s| − ceil(t·|s|) + 1` globally-RAREST shingles (df-ascending
    * order; proof: the first shared element in that order has at least
    * overlap−1 shared elements after it on both sides, and J ≥ t forces
    * overlap ≥ ceil(t·|s|) on each side) — so joining prefix tokens only
    * is provably COMPLETE, unlike minhash LSH's probabilistic recall,
    * while the hot boilerplate shingles that make [[ngramJaccardPairs]]
    * quadratic are exactly the ones the df-ascending prefix excludes.
    * Candidates then verify by exact set intersection; output ≡ the
    * thresholded exact baseline (property-spec-pinned on random corpora,
    * shared oracle).
    *
    * Scale shape: one df aggregation + one per-doc window rank both
    * keyed on hash/id (8-byte shuffle keys), a hash self-join bounded to
    * prefix rows with the size-ratio prune in the join condition, and a
    * per-candidate array intersection. Worst case (a corpus of one
    * near-identical family) is the output size itself — candidate count
    * degenerates only when the answer does.
    */
  def prefixJaccardPairs(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold outside (0, 1]")
    // Null-id rule: see minhashNearDups (completeness is against the
    // null-free pair space either way — a<b rejects NULL). The set table
    // stays LAZY (the r18-cont kernel rebalance): prefixJaccardOver
    // barriers its own prefix table, and the remaining set reads
    // recompute cheaper than a persist.
    prefixJaccardOver(
      shingleSets(docs.where(col("doc_id").isNotNull), n), threshold)
      .barrier()
  }

  /** One-sided n-gram CONTAINMENT pairs: `inter / min(|A|,|B|)` — the
    * asymmetric overlap measure that catches a small document embedded
    * verbatim in a larger one, which symmetric Jaccard dilutes toward 0
    * (inter/union shrinks as the big doc grows; inter/min stays 1.0).
    * Same bounded join shape as [[ngramJaccardPairs]]: 8-byte hash keys,
    * pairs limited to genuinely-overlapping docs; no size-ratio pruning
    * because containment is exactly the signal size-skewed pairs carry.
    *
    * Scale note: without a hot-shingle cap a boilerplate shingle shared
    * by f docs contributes f² join rows — and capping would break
    * containment's semantics (a fully-contained doc IS made of common
    * shingles). This is therefore the EXACT baseline; the scale path is
    * [[TextAnalysis.dupSpans]]'s containment column, which bounds the
    * pair join through the winnowing fingerprint table with its df cap.
    */
  def ngramContainmentPairs(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    // Guard + null-id rules: see minhashNearDups. Set table LAZY — the
    // r18-cont kernel rebalance (measured, sf0.1: 3.38 s cached vs
    // 2.80 s uncached on this exact shape).
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold outside (0, 1]")
    locally {
      val sets = shingleSets(docs.where(col("doc_id").isNotNull), n)
      val ex = sets.select(col("doc_id"), explode(col("sset")).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      val counts = sets.select(col("doc_id"), size(col("sset")).as("cnt"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
        .withColumn("containment",
          Quant.r6(col("inter").cast("double") /
            least(col("ca.cnt"), col("cb.cnt")).cast("double")))
        .filter(col("containment") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("inter").cast("long").as("inter"),
          col("containment"))
        .barrier() // pair-set-sized result, eagerly materialized
    }
  }

  /** Duplicate clusters: connected components over the near-dup pair graph
    * via iterative min-label propagation (the standard distributed CC
    * recipe — each round every node adopts the smallest label among itself
    * and its neighbors; rounds ≈ component diameter, here tiny). Every
    * document gets a cluster id = the min doc_id of its component;
    * singletons are their own cluster.
    *
    * Scale + iteration hygiene: each round is ONE join + ONE aggregation on
    * the edge list, materialized with `localCheckpoint(eager = true)` so the
    * logical plan stays O(1) across rounds (persist alone caches data but
    * round N's plan would still nest all N−1 prior plans, and Catalyst
    * re-analysis cost grows superlinearly).
    *
    * Round complexity: plain min-label propagation needs O(diameter) rounds
    * — a chain of 100 near-identical documents (common in scraped corpora:
    * boilerplate drift) costs 100 blocking jobs. Each round here therefore
    * also POINTER-JUMPS the label table (`l(x) ← l(l(x))`, one self-join),
    * which halves every label-chain and brings the round count to
    * O(log diameter) — the standard distributed-CC shortcutting trick.
    * The convergence signal rides the same pass: each node's previous label
    * is carried through the groupBy (tagged `self` rows), so "did anything
    * change" is a cheap scan of the just-materialized round output.
    */
  def dupClusters(docs: DataFrame, pairs: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .barrier()
    // Iterate only over nodes that have at least one edge — the vast
    // majority of a corpus is singleton and joins back at the end.
    // `labels` is null until round 1 materializes: with identity labels,
    // round 1's neighbor join is the identity map (a neighbor's label IS
    // its id), so the first propagation aggregates the EDGE LIST
    // directly — the separate init distinct + checkpoint and the round-1
    // join are gone (r17; two blocking jobs and one join fewer per
    // query). Duplicate self rows from the un-distinct edge source are
    // harmless under min().
    var labels: DataFrame = null
    var converged = false
    var rounds = 0
    var failed = true
    try {
    while (!converged && rounds < maxRounds) {
      val viaNeighbors =
        if (labels == null)
          edges.select(col("dst").as("doc_id"), col("src").as("cluster"),
            lit(false).as("self"))
        else edges
          .join(labels, edges("src") === labels("doc_id"))
          .select(col("dst").as("doc_id"), col("cluster"), lit(false).as("self"))
      val selfRows =
        if (labels == null)
          edges.select(col("src").as("doc_id"), col("src").as("cluster"),
            lit(true).as("self"))
        else labels.select(col("doc_id"), col("cluster"), lit(true).as("self"))
      // Edges are symmetric, so every label-carrying node appears (at
      // least) once as a `self` row — min(when(self)) recovers its
      // previous label in the SAME aggregation that computes the new one.
      // Checkpointed: the jump self-join below reads this table twice, and
      // an un-materialized aggregation would re-plan (and re-shuffle) on
      // both sides — measured as 2-3× round-time variance under load.
      val prop = selfRows
        .union(viaNeighbors)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster")).as("cluster"),
          min(when(col("self"), col("cluster"))).as("prev"))
        .barrier()
      // prop is materialized (eager barrier), so the previous label
      // generation's blocks can go — otherwise a d-round loop holds
      // O(d) node-table checkpoints until driver GC (the Bpe lesson).
      if (labels != null) Barrier.release(labels)
      // Convergence reads the PROPAGATION fixpoint, BEFORE the jump
      // (r17): with symmetric edges, a stable propagation forces equal
      // labels across every edge (l(x) <= l(y) AND l(y) <= l(x)), so a
      // stable prop is component-constant and the jump is provably a
      // no-op — the converged round skips the jump join and its barrier
      // outright (one blocking job + one checkpoint fewer per query;
      // round counts and final labels are unchanged, since labels are
      // monotone non-increasing and any propagation change keeps the
      // old next-vs-prev test unconverged too).
      val changed = prop
        .agg(count(when(col("cluster") =!= col("prev"), lit(1))).as("n"))
        .head().getLong(0)
      converged = changed == 0L
      if (converged) labels = prop.select(col("doc_id"), col("cluster"))
      else {
        // Pointer jump: follow the label one hop (cluster ←
        // label(cluster)). Labels always point at edge-participating
        // nodes (they start as node ids and min() only ever picks
        // existing labels), so the lookup side is the same table; left
        // join + coalesce is belt-and-braces. Labels are monotone
        // non-increasing, so jumping never overshoots the component
        // minimum.
        val next = prop.as("x")
          .join(prop
            .select(col("doc_id").as("p_id"), col("cluster").as("p_cl"))
            .as("p"), col("x.cluster") === col("p.p_id"), "left")
          .select(col("x.doc_id").as("doc_id"),
            coalesce(col("p.p_cl"), col("x.cluster")).as("cluster"))
          .barrier()
        Barrier.release(prop) // superseded by the materialized jump
        labels = next
      }
      rounds += 1
    }
    if (sys.props.contains("graft.debug"))
      System.err.println(s"[dupClusters] rounds=$rounds converged=$converged")
    // Non-convergence MUST be loud: silently returning at the cap would
    // emit wrong labels with no production-scale signal (the oracle only
    // catches it at test scale). With pointer jumping the round count is
    // O(log diameter), so hitting a 50-round cap means a 2^50-diameter
    // chain — i.e. a bug, not a big graph.
    if (!converged)
      throw new IllegalStateException(
        s"dupClusters did not converge after $rounds rounds " +
          "(labels would be incomplete); raise maxRounds")
    failed = false
    } finally {
      // Edges are dead once the loop exits on ANY path; on a failure
      // (mid-round job error, the non-convergence throw) the label
      // generation is dead too — without these releases the Verify
      // driver, which catches per-query failures and continues, would
      // strand the checkpoint blocks for the rest of the session. (At
      // most one in-flight prop table can remain on a mid-round failure
      // — bounded, and collected by driver GC like any orphan.)
      Barrier.release(edges)
      if (failed && labels != null) Barrier.release(labels)
    }
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("doc_id", "l_id"),
        col("doc_id") === col("l_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
  }

  /** MinHash near-dup clusters for the documents table. */
  def minhashClusters(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame =
    dupClusters(docs, minhashNearDups(docs, n, threshold))

  /** Keep-BEST canonical selection over near-dup clusters: instead of
    * [[dupClusters]]' min-doc_id convention, each cluster keeps its
    * highest-[[TextAnalysis.qualityScore]] member (ties → smallest
    * doc_id) — the selection rule a production dedup actually wants,
    * since the min-id member of a boilerplate cluster is often the worst
    * scrape of the group. Emits every document with its cluster, quality,
    * the cluster's canonical id, and the keep verdict.
    *
    * Determinism: quality is the q6-quantized score (an exact double both
    * engines share); the argmax is `min(struct(-quality, doc_id))`, i.e.
    * pure double/long struct ordering — no float summation anywhere.
    *
    * Scale shape: canonical selection is ONE map-side-combined aggregation
    * keyed on cluster (output rows = clusters), joined back on the same
    * cluster key — both exchanges hash on `cluster`, nothing sorts
    * globally, and the quality score itself is map-only. At 100 TB the
    * dominant cost stays in the cluster construction ([[minhashClusters]]),
    * not this selection pass.
    */
  def keepBestByQuality(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val withQ = clusters
      // Plain (null-rejecting) equi-join on purpose: a no-identity row
      // cannot be a canonical candidate, and the oracle's SQL JOIN drops
      // null ids identically, so the engines agree on any regen. (The
      // null-SAFE <=> lives in softDedupWeights, whose weights are
      // per-row attributes rather than an identity-keyed verdict.)
      .join(docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality")), Seq("doc_id"))
      // Barriered: both the canon aggregation and the final join read this
      // table, and its upstream (the cluster chain's join-back tail + the
      // quality projection) is NOT itself materialized — the two cluster-
      // keyed exchanges differ (partial-agg child vs project child), so
      // ReuseExchange cannot collapse the re-execution.
      .barrier()
    val canon = withQ.groupBy(col("cluster"))
      .agg(min(struct((-col("quality")).as("nq"), col("doc_id").as("id")))
        .as("best"))
      .select(col("cluster"), col("best.id").as("canonical_id"))
    withQ.join(canon, Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("quality"),
        col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }

  /** [[keepBestByQuality]] over the MinHash near-dup clusters. */
  def minhashKeepBest(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame =
    keepBestByQuality(docs, minhashClusters(docs, n, threshold))

  /** SoftDeDup: per-document duplication DOWNWEIGHT instead of removal —
    * every document stays in the corpus but carries a training weight of
    * `1 / |cluster|`, so a boilerplate family of 40 near-identical pages
    * contributes one document's worth of sampling mass rather than 40.
    * The soft alternative to the hard keep-one policies ([[dupClusters]]
    * min-id, [[keepBestByQuality]] argmax): down-weighting preserves
    * coverage of a template's content variants while removing its
    * frequency bias, which is what a training-mix builder usually wants
    * for NEAR duplicates (exact duplicates still warrant removal).
    *
    * Output: (doc_id, cluster, csize, weight_ppm) for EVERY document;
    * singletons carry weight_ppm = 1e6, a cluster of 3 carries 333333.
    * `weight_ppm = 1e6 DIV csize` — integer floor division, exact on any
    * engine, no float ratio anywhere.
    *
    * Scale shape: ONE aggregation keyed on cluster (output rows =
    * clusters) and one join back on the same cluster key — identical to
    * [[keepBestByQuality]]'s selection pass, so the dominant cost stays
    * in the cluster construction the pipeline already ran. The cluster
    * table is barriered because both the size aggregation and the final
    * join read it and its upstream is the CC chain (the two cluster-keyed
    * exchanges differ, so ReuseExchange cannot collapse a re-execution).
    */
  def softDedupWeights(clusters: DataFrame): DataFrame = {
    val cl = clusters.barrier()
    val sizes = cl.groupBy(col("cluster"))
      .agg(count(lit(1)).as("csize"))
    // Null-safe join key (the packAssignments lesson): a NULL-id document
    // carries cluster NULL through the cluster family, and a plain
    // equi-join would silently drop every such row from the weight table.
    cl.join(sizes.withColumnRenamed("cluster", "__scl"),
        col("cluster") <=> col("__scl"))
      .select(col("doc_id"), col("cluster"), col("csize"),
        expr("1000000 DIV csize").cast("long").as("weight_ppm"))
  }

  /** [[softDedupWeights]] over the MinHash near-dup clusters. */
  def minhashSoftDedup(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame =
    softDedupWeights(minhashClusters(docs, n, threshold))

  /** LEAKAGE-SAFE train/val/test assignment over a cluster table: the
    * split coin is drawn on the CLUSTER id, not the document, so every
    * member of a near-dup cluster lands in the same split by
    * construction. Splitting documents independently leaks eval answers
    * into training whenever a near-duplicate of a test document survives
    * in train — the contamination mode document-level dedup alone does
    * not close (a 0.51-jaccard paraphrase passes the dedup filter and
    * still gives the benchmark away). Cluster-atomic assignment is the
    * standard fix (the eval-split discipline behind deduplicated LM
    * corpora, cf. Lee et al. 2022 §6's train/test leakage measurements).
    *
    * Coin/threshold arithmetic is [[Curation.hexThreshold]]'s — a
    * deterministic md5 byte with 1/256 resolution that any engine
    * reproduces exactly; `seed` redraws the whole assignment. Fractions
    * are of CLUSTERS, not documents (a giant boilerplate cluster moves
    * its whole mass into one split — the price of zero leakage, and why
    * the fractions are only expectations).
    *
    * Scale shape: the split column is a PROJECTION over the cluster
    * table — no exchange, no join, no state beyond what the cluster
    * computation itself needed (plan-locked). At 100 TB the cost is the
    * near-dup clustering you were running anyway.
    */
  def splitAssign(clusters: DataFrame, testFrac: Double = 0.1,
      valFrac: Double = 0.1, seed: Long = 0L): DataFrame = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac <= 1.0,
      s"testFrac=$testFrac valFrac=$valFrac must be non-negative and sum <= 1")
    val coin = substring(
      md5(concat(lit(s"split:$seed:"), col("cluster").cast("string"))), 1, 2)
    // A NULL cluster id (the null-id documents' cluster) makes the coin
    // NULL: both when-branches evaluate NULL and the row falls to
    // 'train' deterministically — on EVERY seed and on both engines
    // (the oracle's CASE nulls out the same way). Documented rather
    // than guarded: train is the leakage-safe default (such docs can
    // never contaminate val/test).
    clusters.select(col("doc_id"), col("cluster"),
      when(coin < lit(Curation.hexThreshold(testFrac)), lit("test"))
        .when(coin < lit(Curation.hexThreshold(testFrac + valFrac)),
          lit("val"))
        .otherwise(lit("train")).as("split"))
  }

  /** [[splitAssign]] over the MinHash near-dup clusters. */
  def minhashSplit(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      testFrac: Double = 0.1, valFrac: Double = 0.1,
      seed: Long = 0L): DataFrame =
    splitAssign(minhashClusters(docs, n, threshold), testFrac, valFrac, seed)

  // ---- SimHash ----------------------------------------------------------

  /** 32-bit SimHash over whitespace tokens: per-token md5-derived bits
    * voted bit-wise, sign of the vote becomes the fingerprint bit; near-dup
    * = small Hamming distance. The hex→int step (`conv(substr(md5, 1, 8))`)
    * is reproduced in the DuckDB oracle with per-character positional
    * arithmetic (strpos over '0123456789abcdef'), so the whole pipeline is
    * hash-checkable despite the engine-specific conv() builtin.
    *
    * Shape: explode tokens → hash each token ONCE → one hash aggregation
    * with 32 conditional sums (codegen'd, map-side combined). The naive
    * form — 32 separate array folds each re-hashing every token — costs
    * 32× the md5 work and runs in the interpreted HOF path.
    */
  def simhashes(docs: DataFrame): DataFrame =
    withTokenlessZero(docs, simhashesImpl(docs, 32, 8))

  /** 60-bit SimHash — the SCALE variant: same vote pipeline, fingerprint
    * from the first 15 hex chars of each token's md5 (60 bits keeps the
    * value signed-LONG-safe and the oracle's positional hex arithmetic
    * inside exact-double powers of 16). The payoff is in blocking: at
    * maxDist=3 the pigeonhole blocks are 15 bits wide (32768 keys) versus
    * the 32-bit variant's 4-5 bits, so candidate collisions drop by ~3
    * orders of magnitude — this is the variant to run on a large corpus.
    */
  def simhashes64(docs: DataFrame): DataFrame =
    withTokenlessZero(docs, simhashesImpl(docs, 60, 15))

  /** Doc-level signature contract: token-less/null docs carry simhash 0
    * (a row per DOCUMENT). The PAIR paths consume the votes-only table
    * instead — signature 0 is not similarity evidence, and re-adding
    * blank docs would make every pair of them a distance-0 "near-dup"
    * clique on one hot all-zero block key (the exact quadratic blow-up
    * the minhash and winnowing paths already exclude).
    */
  private def withTokenlessZero(docs: DataFrame, sigs: DataFrame): DataFrame =
    // Null-id docs drop from the doc-level table too: a LEFT join keeps
    // unmatched null-KEY left rows, so without this filter every null-id
    // doc emitted a (NULL, 0) signature row — contradicting the family's
    // no-identity exclusion (and an N-rows-vs-one-GROUP-BY-row hash
    // split against any future SQL restatement on a nullable regen).
    docs.where(col("doc_id").isNotNull).select(col("doc_id"))
      .join(sigs, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("simhash"), lit(0L)).as("simhash"))

  private def simhashesImpl(docs: DataFrame, bits: Int,
      hexChars: Int): DataFrame =
    // Null-id rows dropped up front (the family rule): their tokens
    // would otherwise vote into ONE NULL-keyed frankendoc signature —
    // never emitted anywhere (the doc-level left join and the pair
    // self-join are both null-rejecting), pure wasted vote work.
    //
    // PER-ROW signature via the codegen kernel since r18
    // (graft.functions.SimhashExpr ≡ the former explode → per-token
    // hash → ±1-vote AGGREGATION, spec-pinned multiset-equal): the
    // doc_id-keyed vote exchange — one corpus-wide shuffle at scale —
    // is GONE, the same §2.4 rewrite the minhash banding got in r17.
    // The votes-only one-row-per-tokenized-doc contract rides the
    // explode_outer(when(size > 0, array(sig))) + isNotNull-on-the-
    // GENERATED-attribute shape: a bare size(toks) > 0 filter would be
    // pushed below the token projection and re-run the tokenizer per
    // row (the bandBucketsFromSets trap), while a filter on the
    // generated attribute cannot sink below its Generate.
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"),
        TextAnalysis.wsTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode_outer(when(size(col("toks")) > 0,
          array(graft.functions.TextFunctions
            .simhash(col("toks"), bits, hexChars)))).as("simhash"))
      .where(col("simhash").isNotNull)

  /** SimHash near-dup pairs: Hamming distance <= maxDist, candidate-limited
    * by exact match on one of `blocks` fingerprint blocks (the standard
    * pigeonhole trick: distance <= maxDist ⇒ some block of
    * bits/(maxDist+1) is identical).
    *
    * VERIFICATION-SCALE ONLY (SparkEntry.verificationScaleOnly): 32 bits
    * over 4+ blocks means 4-5-bit block keys, which collide massively at
    * corpus scale — [[simhashNearDups64]] (15-bit keys) is the variant a
    * scale run uses.
    */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3): DataFrame =
    simhashNearDupsImpl(simhashesImpl(docs, 32, 8), 32, maxDist)

  /** Near-dups over the 60-bit fingerprints — same pigeonhole recipe with
    * 15-bit block keys (see [[simhashes64]] for why this is the variant
    * that survives corpus scale).
    */
  def simhashNearDups64(docs: DataFrame, maxDist: Int = 3,
      maxBlockDf: Int = 0): DataFrame =
    simhashNearDupsImpl(simhashesImpl(docs, 60, 15), 60, maxDist, maxBlockDf)

  private def simhashNearDupsImpl(sh0: DataFrame, bits: Int,
      maxDist: Int, maxBlockDf: Int = 0): DataFrame = {
    // Guard the pigeonhole arithmetic (the fuzzyPairs rule): a negative
    // maxDist divides by zero with no operator context, and maxDist+1 >
    // bits makes width 0 — every block key collapses to `x & 0 = 0` and
    // the self-join silently degenerates to the full cross product per
    // block, the exact f² blowup the caps exist to fence.
    require(maxDist >= 0, s"maxDist=$maxDist must be >= 0")
    require(maxDist + 1 <= bits,
      s"maxDist=$maxDist needs ${maxDist + 1} blocks over $bits bits — " +
        "block width would be 0 (all keys collide)")
    val blocks = maxDist + 1
    val width = bits / blocks
    // One row per doc — materialize before the self-join below so the
    // token-explode + md5 + vote aggregation runs once, not once
    // per join side.
    val sh = sh0.barrier()
    try {
      val blocked = sh.select(col("doc_id"), col("simhash"),
        explode(array((0 until blocks).map(b =>
          struct(lit(b).as("blk"),
            shiftright(col("simhash"), b * width)
              .bitwiseAND((1L << width) - 1).as("key"))): _*)).as("bk"))
        .select(col("doc_id"), col("simhash"),
          col("bk.blk").as("blk"), col("bk.key").as("key"))
      // Hamming distance is computed MAP-SIDE inside the join and filtered
      // BEFORE the dedup shuffle: 32-bit fingerprints give each block a
      // 4-5-bit key, so bucket collisions produce orders of magnitude more
      // candidates than true pairs (5.5M vs 83k at sf0.1) — distinct-ing
      // first would exchange all of them; bit_count is a codegen'd
      // single-instruction check, so verify-then-dedup is strictly cheaper.
      // With a cap, the capped table feeds BOTH self-join sides — the
      // hot-key aggregation and its anti-join would run twice unbarriered
      // (the minhashNearDupsFromSets discipline).
      val capped0 = capHotKeys(blocked, Seq("blk", "key"), maxBlockDf)
      val capped = if (maxBlockDf > 0) capped0.barrier() else capped0
      try {
        // Eager TINY pair result + finally-release of the working
        // barriers (the minhashNearDupsFromSets discipline): returned
        // lazy, the corpus-sized signature and capped-block checkpoints
        // were stranded for the session per invocation.
        capped.as("l").join(capped.as("r"),
            col("l.blk") === col("r.blk") && col("l.key") === col("r.key") &&
              col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
            bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
              .cast("long").as("dist"))
          .filter(col("dist") <= maxDist)
          .distinct()
          .barrier()
      } finally if (maxBlockDf > 0) Barrier.release(capped)
    } finally Barrier.release(sh)
  }
}
