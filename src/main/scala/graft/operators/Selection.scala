package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-SELECTION operators — the "which documents make the training set"
  * family that sits between cleaning (Curation) and packing: importance
  * resampling toward a target distribution (DSIR, Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"),
  * per-source caps (the Common-Crawl-pipeline rule that no single domain
  * may dominate the corpus), and a deterministic sharded epoch shuffle
  * (the training-order step a data loader consumes).
  *
  * All three are pure Column algebra — no UDFs, oracle-replayable.
  */
object Selection {

  /** Number of hash buckets for the DSIR feature space (2^12; DSIR uses
    * hashed n-gram features for exactly this boundedness reason).
    */
  val dsirBuckets = 4096

  /** Lower-cased whitespace tokens — the canonical tokenizer, case-folded
    * (one definition lives in TextAnalysis; trim∘lower ≡ lower∘trim for
    * whitespace, and the oracle splits lower(trim(text)) likewise).
    */
  private def lowerToks(text: Column): Column =
    TextAnalysis.wsTokens(lower(text))

  /** Hash a token into [0, dsirBuckets): leading hex chars of md5 — the
    * same engine-portable md5 family every other graft hash uses. The
    * hex WIDTH is derived from [[dsirBuckets]] (one definition — a
    * retuned bucket count with a hand-synced width would leave most of
    * every weight array untrained and unread, silently): the require
    * pins the count to a power of 16 so the derivation is exact.
    */
  private val BucketHexWidth: Int = {
    val w = (math.log(dsirBuckets.toDouble) / math.log(16.0)).round.toInt
    require(dsirBuckets == math.pow(16.0, w.toDouble).toLong,
      s"dsirBuckets=$dsirBuckets must be a power of 16 (md5 hex prefix)")
    w
  }

  private def bucket(tok: Column): Column =
    conv(substring(md5(tok), 1, BucketHexWidth), 16, 10).cast("long")

  /** The default DSIR target: documents passing a quality bar — the
    * paper's headline use case ("select raw web documents that look like
    * the curated corpus"), expressed over a signal that actually varies
    * in the synthetic corpus (the `lang` column is independent of the
    * token distribution there — the vocabulary is fully shared — so a
    * metadata split would carry no signal to learn).
    */
  def qualityTarget(threshold: Double = 0.65): Column =
    TextAnalysis.qualityScore(col("text")) >= threshold

  /** The trained DSIR model: the literal per-bucket weight array plus the
    * above-raw-mean keep threshold — everything scoring needs, batch or
    * streaming, with no further corpus passes.
    */
  case class DsirModel(weights: IndexedSeq[Long], threshold: Long)

  /** DSIR-style importance model: rates every document by how much more
    * likely its hashed-unigram bag is under a TARGET distribution (docs
    * matching `targetFilter`) than under the RAW distribution (the rest).
    *
    * Deviations from the paper, both chosen for cross-engine exactness:
    *  - the paper's weight is the log-likelihood ratio
    *    `sum_t log(p_tgt(b_t)) - log(p_raw(b_t))`; transcendental logs
    *    are not bit-identical across engines, so the per-bucket weight
    *    here is the cross-multiplied numerator of the SAME comparison,
    *    `w[b] = (tc[b]+1)*(R+B) - (rc[b]+1)*(T+B)` (BIGINT-exact; tc/rc
    *    = target/raw bucket counts, T/R = totals, B = buckets, +1 =
    *    add-one smoothing). `w[b] > 0` iff the smoothed target
    *    probability of bucket b exceeds the raw probability, so the
    *    per-token sign agrees with the paper's log ratio; the document
    *    score is the exact integer sum.
    *  - the paper samples top-k by importance weight (a global order);
    *    `keep` here selects raw docs scoring ABOVE THE RAW-POOL MEAN —
    *    rank-free, so no global sort. The mean comparison is exact:
    *    `score > floorDiv(sum_raw, n_raw)` ⟺ `score·n_raw > sum_raw`
    *    for positive n_raw (floor division toward −∞), without ever
    *    forming the overflow-prone product.
    *
    * Output: (doc_id, dsir_score, in_target, keep) for every document.
    *
    * Scale (100 TB): ONE model pass — a single bucket-bounded aggregation
    * (≤ 2×4097 rows) carries both the per-bucket token counts and, via a
    * doc-head marker (pos 0 / empty-doc row from posexplode_outer), the
    * per-pool document counts; everything else is driver arithmetic. The
    * weights fold into ONE literal array and the raw-pool score SUM is
    * derived from the same counts (`sum_raw = Σ_b rc[b]·w[b]` — every raw
    * token contributes its bucket weight exactly once, BigInt on the
    * driver), so the scoring pass is map-only with literal thresholds:
    * zero joins, zero shuffles. `modelSampleHex` implements the paper's
    * sample-based model estimation (a deterministic md5 coin on doc_id),
    * which is also the int64-overflow guard at petabyte scale: bounded
    * sample => bounded counts => bounded per-doc scores ("ff" = train on
    * everything, right for test scales; at corpus scales pick a coin cap
    * that bounds the model sample — coins run "00".."ff", so a cap of
    * "0f" keeps 16/256 = 1/16 of docs, "00" keeps 1/256).
    */
  def dsirModel(docs: DataFrame,
      targetFilter: Column = qualityTarget(),
      modelSampleHex: String = "ff"): DsirModel = {
    val (tc, rc, _, nRaw) = classBucketCounts(docs, targetFilter,
      "dsir:", modelSampleHex, "modelSampleHex")
    val w = crossMultipliedWeights(tc, rc, "DSIR", "modelSampleHex")
    // Raw-pool mean threshold, exact from the model counts (BigInt: the
    // per-bucket products can exceed Long at large model samples even
    // when the final threshold fits comfortably).
    val sumRaw = (0 until dsirBuckets)
      .map(i => BigInt(rc(i)) * BigInt(w(i))).sum
    val threshold: Long =
      if (nRaw == 0) Long.MaxValue // no raw pool -> nothing kept
      else floorDivChecked(sumRaw, BigInt(nRaw), "DSIR", "modelSampleHex")
    DsirModel(w.toIndexedSeq, threshold)
  }

  /** Smoothed cross-multiplied per-bucket weights shared by the DSIR and
    * Naive-Bayes linear models: `w_i = (a_i+1)(B+b) − (b_i+1)(A+b)`, with
    * the per-doc-sum overflow guard (at a "ff" coin cap on a large corpus
    * the raw Long product wraps silently and every weight/threshold/
    * verdict becomes garbage with no error raised — the guard names the
    * knob). ONE definition (the classBucketCounts rule): a retune or
    * guard fix lands in both models at once — the two verbatim copies
    * this replaces had already been patched in lockstep twice.
    */
  private def crossMultipliedWeights(aCounts: Array[Long],
      bCounts: Array[Long], what: String, knob: String): Array[Long] = {
    val bigA = aCounts.sum
    val bigB = bCounts.sum
    val b = dsirBuckets.toLong
    Array.tabulate(dsirBuckets) { i =>
      val wi = BigInt(aCounts(i) + 1L) * BigInt(bigB + b) -
        BigInt(bCounts(i) + 1L) * BigInt(bigA + b)
      require(wi.abs <= MaxSafeWeight,
        s"$what weight $wi exceeds the per-doc-sum-safe bound " +
          s"(Long.MaxValue/2^20) — shrink $knob")
      wi.toLong
    }
  }

  /** Floor division toward −∞ (BigInt `/` truncates toward zero; the
    * equivalence with the cross-multiplied scoring comparison needs
    * floor) with the int64 bound check — shared by both models'
    * threshold calibrations.
    */
  private def floorDivChecked(num: BigInt, den: BigInt, what: String,
      knob: String): Long = {
    val fl = if (num >= 0 || num % den == 0) num / den else num / den - 1
    require(fl.isValidLong,
      s"$what threshold $fl exceeds int64 — shrink $knob")
    fl.toLong
  }

  /** The shared ONE-PASS training scaffold of the DSIR and Naive-Bayes
    * linear models: validates the two-lowercase-hex md5 coin cap, runs
    * the single (class, bucket) count aggregation, and folds the
    * collected rows into per-class bucket-count arrays plus per-class
    * doc counts. posexplode_outer emits every token with its position
    * plus one null-token row per empty doc, so `docheads` (pos-0 or
    * empty-doc rows) sums to exactly one per document; empty docs group
    * under the null bucket and contribute no token count. The class
    * column is coalesced to false so a null filter verdict (e.g. null
    * text) counts as the negative/raw class instead of crashing the
    * driver-side Row.getBoolean. `coinPrefix` salts the doc_id coin
    * ("dsir:" / "nb:") so the two models sample independently.
    * Returns (trueCounts, falseCounts, nTrueDocs, nFalseDocs).
    */
  /** The md5 coin compares LEXICOGRAPHICALLY, so an uppercase or
    * malformed cap silently mis-samples ('F' sorts below 'a'); every
    * entry point that consumes a hex cap validates through here.
    */
  private def requireLowerHex(name: String, value: String): Unit =
    require(value.length == 2 && value.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"$name='$value' must be two LOWERCASE hex chars " +
        "(the md5 coin is lowercase; an uppercase cap silently " +
        "mis-samples under lexicographic compare)")

  /** The deterministic md5 sampling coin over doc_id — ONE definition for
    * the model-training splits and their in_train audit columns, so the
    * prefix or substring range can never drift between the rows a model
    * trained on and the rows an accuracy audit excludes.
    */
  private def sampleCoin(prefix: String): Column =
    substring(md5(concat(lit(prefix), col("doc_id").cast("string"))), 1, 2)

  /** Per-bucket weight magnitude cap: a per-DOCUMENT score is the Long
    * sum of one weight per token ([[bucketWeightSum]]), so weights are
    * bounded to Long.MaxValue >> 20 — the sum stays exact int64 for any
    * document up to 2^20 (~1M) tokens. `isValidLong` alone bounded the
    * WEIGHT but not the doc sum, which could wrap silently on long docs
    * at extreme model samples.
    */
  private val MaxSafeWeight = Long.MaxValue >> 20

  private def classBucketCounts(docs: DataFrame, classFilter: Column,
      coinPrefix: String, sampleHex: String, hexParamName: String)
      : (Array[Long], Array[Long], Long, Long) = {
    requireLowerHex(hexParamName, sampleHex)
    val coin = sampleCoin(coinPrefix)
    val rows = docs
      .select(col("doc_id"),
        coalesce(classFilter, lit(false)).as("cls"),
        lowerToks(col("text")).as("toks"))
      .where(coin <= sampleHex)
      .select(col("cls"), posexplode_outer(col("toks")).as(Seq("pos", "tok")))
      .select(col("cls"), bucket(col("tok")).as("bkt"),
        when(col("pos").isNull || col("pos") === 0, 1L).otherwise(0L)
          .as("dochead"))
      .groupBy(col("cls"), col("bkt"))
      .agg(count(col("bkt")).as("c"), sum(col("dochead")).as("docheads"))
      .collect()
    val tCounts = new Array[Long](dsirBuckets)
    val fCounts = new Array[Long](dsirBuckets)
    var nTrue = 0L
    var nFalse = 0L
    rows.foreach { r =>
      val cls = r.getBoolean(0)
      if (!r.isNullAt(1)) {
        val arr = if (cls) tCounts else fCounts
        arr(r.getLong(1).toInt) += r.getLong(2)
      }
      if (cls) nTrue += r.getLong(3) else nFalse += r.getLong(3)
    }
    (tCounts, fCounts, nTrue, nFalse)
  }

  /** Map-only scoring expression: the exact integer weight sum of a
    * token array under a literal per-bucket weight array — the shared
    * scoring kernel of the DSIR and Naive-Bayes linear models.
    */
  private def bucketWeightSum(weights: IndexedSeq[Long], toks: Column): Column = {
    val warr = typedlit(weights)
    aggregate(toks, lit(0L),
      (acc, t) => acc + element_at(warr, (bucket(t) + 1L).cast("int")))
  }

  private def dsirScoreCol(model: DsirModel, toks: Column): Column =
    bucketWeightSum(model.weights, toks)

  /** DETERMINISTIC-INPUT precondition (the heavyTokens two-pass rule):
    * the model trains on one evaluation of `docs` (driver collect) and
    * scores a second — the input must re-evaluate to the same rows
    * (any source scan does; salt or barrier anything else), or the
    * threshold/coin-split contracts silently bind to different rows
    * than the ones scored.
    */
  def dsirScores(docs: DataFrame,
      targetFilter: Column = qualityTarget(),
      modelSampleHex: String = "ff"): DataFrame =
    // The batch pass IS the streaming scoring map under a just-trained
    // model — one definition, so the spec-pinned stream ≡ batch identity
    // cannot drift.
    streamingDsirScores(docs,
      dsirModel(docs, targetFilter, modelSampleHex), targetFilter)

  /** Streaming twin of [[dsirScores]]' SCORING half: a crawl pipeline
    * trains the model offline (bounded sample) and scores documents at
    * ingest — which is a pure map over the stream once the model is
    * literals: no state, no watermark, no shuffle. Emits the same
    * (dsir_score, in_target, keep) verdict columns as the batch pass
    * (spec-pinned stream ≡ batch on a replayed corpus; [[dsirScores]]
    * delegates here, so the two paths share one scoring definition).
    */
  def streamingDsirScores(docs: DataFrame, model: DsirModel,
      targetFilter: Column = qualityTarget()): DataFrame =
    // The samplers' null-id rule (sourceCaps/epochShuffle in this file,
    // oracle-mirrored): a no-identity doc would emit a row the oracle's
    // doc_id equi-join structurally drops — a row-count hash mismatch on
    // any regen that grows a NULL id (the coin/verdict columns would
    // also be three-valued NULLs).
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"),
        coalesce(targetFilter, lit(false)).as("in_target"),
        lowerToks(col("text")).as("toks"))
      .select(col("doc_id"),
        // Belt-and-braces coalesce: wsTokens' null ≡ empty contract
        // already makes the fold total (null text tokenizes to [] and
        // folds to 0) — this only guards a future tokenizer regression.
        coalesce(dsirScoreCol(model, col("toks")), lit(0L))
          .as("dsir_score"),
        col("in_target"))
      .withColumn("keep",
        !col("in_target") && col("dsir_score") > model.threshold)

  /** The trained Naive-Bayes quality model: the literal per-bucket weight
    * array plus the calibrated decision threshold — everything scoring
    * needs, batch or streaming.
    */
  case class NbModel(weights: IndexedSeq[Long], threshold: Long)

  /** Multinomial Naive-Bayes quality classifier — the supervised learner
    * DSIR is not (DSIR rates importance toward a target distribution; this
    * LEARNS a labeled decision boundary). It is the parallel exact
    * replacement for the sequential averaged perceptron: training is ONE
    * order-free aggregation (per-class hashed-bucket token counts), so the
    * learned model is bit-identical however the corpus is partitioned —
    * the property no synchronous perceptron variant had.
    *
    * Deviations from textbook NB, both for cross-engine integer exactness
    * (the same two DSIR documents at [[dsirModel]]):
    *  - per-bucket weight is the cross-multiplied numerator of the
    *    add-one-smoothed likelihood comparison,
    *    `w[b] = (pc[b]+1)*(Nn+B) − (nc[b]+1)*(Np+B)` (pc/nc = positive/
    *    negative-class bucket counts, Np/Nn = class token totals, B =
    *    buckets): `w[b] > 0` iff the smoothed positive-class probability
    *    of bucket b exceeds the negative-class one, so each token's sign
    *    agrees with its log-likelihood ratio; the document score is the
    *    exact integer sum of token weights.
    *  - the decision threshold is CALIBRATED, not the textbook prior:
    *    `pred = score > floorDiv(sp·nn + sn·np, 2·np·nn)` — the midpoint
    *    of the two training-class MEAN scores (sp/sn = summed scores of
    *    positive/negative training docs, np/nn = their doc counts). The
    *    cross-multiplied surrogate has a systematic class-size bias that
    *    a zero threshold cannot absorb (for a token with identical class
    *    distributions, `w[b]` carries the sign of `Np−Nn`, and a
    *    200-token document accumulates 200 copies of that bias — scoring
    *    everything one class; measured: all-True at sf0.01, accuracy
    *    0.44); centering between the class score means is the exact
    *    integer analogue of learning the bias term, and lifts held-out
    *    accuracy to 0.91 at sf0.01. The floorDiv form is
    *    comparison-exact: for integer s, `s > x ⟺ s > floor(x)`.
    *    Degenerate one-class training calibrates to Long.MaxValue (no
    *    positives seen → never predict positive) or Long.MinValue.
    *
    * Scale (100 TB): one bucket-bounded training aggregation (≤ 2×4097
    * rows collected — the posexplode_outer dochead marker rides along to
    * count class docs, exactly [[dsirModel]]'s shape); weights fold to
    * ONE literal array and the calibration sums derive from the SAME
    * counts (`sp = Σ_b pc[b]·w[b]`, BigInt on the driver) — no second
    * corpus pass; scoring is map-only — zero joins, zero shuffles.
    * `trainSampleHex` is the md5 train-split coin ("nb:<doc_id>", "7f" ≈
    * half) and doubles as the int64-overflow guard: bounded training
    * sample ⇒ bounded counts ⇒ bounded cross-products.
    */
  def nbModel(docs: DataFrame,
      labelFilter: Column = qualityTarget(),
      trainSampleHex: String = "7f"): NbModel = {
    val (pc, nc, nPos, nNeg) = classBucketCounts(docs, labelFilter,
      NbCoinPrefix, trainSampleHex, "trainSampleHex")
    val w = crossMultipliedWeights(pc, nc, "NB", "trainSampleHex")
      .toIndexedSeq
    // Class score sums from the model counts (every token of a class's
    // training docs contributes its bucket weight exactly once).
    val sp = (0 until dsirBuckets).map(i => BigInt(pc(i)) * BigInt(w(i))).sum
    val sn = (0 until dsirBuckets).map(i => BigInt(nc(i)) * BigInt(w(i))).sum
    val threshold: Long =
      if (nPos == 0) Long.MaxValue
      else if (nNeg == 0) Long.MinValue
      else floorDivChecked(sp * nNeg + sn * nPos,
        BigInt(2) * nPos * nNeg, "NB", "trainSampleHex")
    NbModel(w, threshold)
  }

  /** The deterministic train-split coin: docs whose md5("nb:<doc_id>")
    * prefix is ≤ the sample cap train the model; the rest are held out —
    * the spec's accuracy evidence is measured on exactly that complement.
    * Same [[sampleCoin]] expression classBucketCounts trains with.
    */
  private def nbTrainCoin: Column = sampleCoin(NbCoinPrefix)

  /** The NB split's coin prefix — shared by training and the in_train
    * audit column (a one-sided edit would silently include training docs
    * in held-out accuracy). */
  private val NbCoinPrefix = "nb:"

  /** Train-and-score in one call: trains on the coin-selected split, then
    * scores EVERY document map-only. Output: (doc_id, nb_score, label,
    * pred, in_train) — `in_train` marks the training split so accuracy
    * audits can exclude it without re-deriving the coin.
    *
    * DETERMINISTIC-INPUT precondition: training collects from one
    * evaluation of `docs` and scoring re-evaluates it (the dsirScores
    * contract — see there).
    */
  def nbQuality(docs: DataFrame,
      labelFilter: Column = qualityTarget(),
      trainSampleHex: String = "7f"): DataFrame =
    streamingNbScores(docs,
      nbModel(docs, labelFilter, trainSampleHex), labelFilter, trainSampleHex)

  /** Streaming twin of [[nbQuality]]'s SCORING half: train offline, score
    * at ingest — a pure map once the model is literals (no state, no
    * watermark, no shuffle). [[nbQuality]] delegates here, so batch and
    * stream share one scoring definition and the stream ≡ batch identity
    * cannot drift.
    */
  def streamingNbScores(docs: DataFrame, model: NbModel,
      labelFilter: Column = qualityTarget(),
      trainSampleHex: String = "7f"): DataFrame = {
    // Direct callers get the same cap validation training enforces — an
    // uppercase cap here would silently drift in_train from the split
    // the model was trained on and leak training docs into any held-out
    // accuracy audit.
    requireLowerHex("trainSampleHex", trainSampleHex)
    // The samplers' null-id rule (streamingDsirScores): the oracle's
    // doc_id equi-join structurally drops a NULL-id row this side would
    // otherwise emit — and its md5 train coin would be NULL anyway.
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"),
        coalesce(labelFilter, lit(false)).as("label"),
        lowerToks(col("text")).as("toks"),
        (nbTrainCoin <= trainSampleHex).as("in_train"))
      .select(col("doc_id"),
        // Belt-and-braces coalesce: wsTokens' null ≡ empty contract
        // already makes the fold total (null text tokenizes to [] and
        // folds to 0) — this only guards a future tokenizer regression.
        coalesce(bucketWeightSum(model.weights, col("toks")), lit(0L))
          .as("nb_score"),
        col("label"), col("in_train"))
      .withColumn("pred", col("nb_score") > model.threshold)
  }

  /** Per-source cap: keep at most `cap` documents per source, best-first
    * by `quality` (ties broken by doc_id). The Common-Crawl-pipeline
    * version caps per registered domain so boilerplate-heavy hosts cannot
    * dominate the corpus; `source` plays the domain role here and the
    * ordering column is caller-supplied (defaults to
    * [[TextAnalysis.qualityScore]]).
    *
    * Output: the kept rows only — (doc_id, source, src_rank).
    *
    * Scale (100 TB): one hash exchange on `source`; the rank<=cap filter
    * sits directly on the row_number so Spark plans a WindowGroupLimit —
    * each map task keeps at most `cap` rows per source before the
    * exchange, so the shuffle carries O(sources x cap), not the corpus.
    * Heavily-skewed sources are exactly the ones the cap truncates.
    */
  def sourceCaps(docs: DataFrame, cap: Int = 10,
      quality: Column => Column = TextAnalysis.qualityScore): DataFrame = {
    // The sibling samplers' loud-guard discipline (uniformSample k,
    // clusterBalancedSample cap, epochShuffle numShards): cap <= 0
    // would make `src_rank <= cap` constant-false and silently empty
    // the training set.
    require(cap >= 1, s"cap=$cap must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("source"))
      .orderBy(quality(col("text")).desc, col("doc_id"))
    // The samplers' identity rule (uniformSample): a NULL doc_id defeats
    // the deterministic tie-break — two null-id docs with equal quality
    // would make WHICH one survives the cap boundary shuffle-order
    // dependent. The oracle mirrors the filter.
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"), col("source"),
        row_number().over(win).cast("long").as("src_rank"))
      .where(col("src_rank") <= cap)
  }

  /** Deterministic sharded epoch shuffle — the training-order step: every
    * document gets a pseudo-random shard and a position within that shard,
    * both pure functions of (seed, doc_id), so every epoch's order is
    * reproducible and a data loader can stream shard files sequentially.
    *
    * key = md5("epoch:<seed>:<doc_id>"); shard = first-32-bits(key) mod
    * numShards (32 bits so shard counts in the tens of thousands — the
    * realistic setting for a 100 TB corpus — stay uniform: the modulo
    * bias of a non-power-of-two count is ≤ numShards/2³²); pos = rank of
    * key within the shard.
    *
    * Output: (doc_id, shard, pos).
    *
    * Scale (100 TB): this is why the shuffle is SHARDED — a single global
    * `ORDER BY random()` is one totally-ordered sort (range exchange plus
    * a final single-writer pass per epoch). Here each shard sorts
    * 1/numShards of the corpus independently (one hash exchange, per-shard
    * local sort), and the loader-side merge across shards is free because
    * training consumes shards round-robin anyway.
    */
  def epochShuffle(docs: DataFrame, seed: Int = 0,
      numShards: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0 && numShards <= (1 << 20),
      s"numShards=$numShards outside (0, 2^20] — the 32-bit key prefix " +
        "keeps modulo bias negligible only well below 2^32 shards")
    val key = md5(concat(lit(s"epoch:$seed:"), col("doc_id").cast("string")))
    val shard = conv(substring(key, 1, 8), 16, 10).cast("long") % numShards
    val win = Window.partitionBy(col("shard"))
      .orderBy(col("skey"), col("doc_id"))
    // The samplers' identity rule: null-id rows have a NULL key and
    // shard — they'd pile into one NULL-shard partition with arrival-
    // order-dependent positions, breaking the reproducible-epoch
    // contract. The oracle mirrors the filter.
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id"), shard.as("shard"), key.as("skey"))
      .select(col("doc_id"), col("shard"),
        row_number().over(win).cast("long").as("pos"))
  }
}
