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

  private def lowerToks(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  /** Hash a token into [0, 4096): leading 3 hex chars of md5 — the same
    * engine-portable md5 family every other graft hash uses.
    */
  private def bucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 3), 16, 10).cast("long")

  /** The default DSIR target: documents passing a quality bar — the
    * paper's headline use case ("select raw web documents that look like
    * the curated corpus"), expressed over a signal that actually varies
    * in the synthetic corpus (the `lang` column is independent of the
    * token distribution there — the vocabulary is fully shared — so a
    * metadata split would carry no signal to learn).
    */
  def qualityTarget(threshold: Double = 0.65): Column =
    TextAnalysis.qualityScore(col("text")) >= threshold

  /** DSIR-style importance scoring: score every document by how much more
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
    *    `keep` here selects raw docs scoring ABOVE THE RAW-POOL MEAN,
    *    compared integer-exactly by cross-multiplication
    *    (`score * n_raw > sum_raw`) — rank-free, so no global sort.
    *
    * Output: (doc_id, dsir_score, in_target, keep) for every document.
    *
    * Scale (100 TB): the model tables are bucket-bounded (2×4096 rows —
    * collected to the driver and folded into ONE literal weight array),
    * and the raw-pool score SUM is derived on the driver from those same
    * counts (`sum_raw = Σ_b rc[b]·w[b]` — every raw token contributes its
    * bucket weight exactly once), so the scoring pass is map-only with
    * literal thresholds: zero joins, zero shuffles. In the paper the
    * models are estimated on a fixed-size held-out sample, which is also
    * the int64-overflow guard at petabyte scale: bounded sample =>
    * bounded counts.
    */
  def dsirScores(docs: DataFrame,
      targetFilter: Column = qualityTarget()): DataFrame = {
    val toks = docs
      .select(col("doc_id"), targetFilter.as("in_target"),
        lowerToks(col("text")).as("toks"))
    val buckets = toks
      .select(col("in_target"), explode(col("toks")).as("tok"))
      .select(col("in_target"), bucket(col("tok")).as("bkt"))
      .groupBy(col("in_target"), col("bkt")).agg(count(lit(1)).as("c"))
      .collect()

    val tc = new Array[Long](dsirBuckets)
    val rc = new Array[Long](dsirBuckets)
    buckets.foreach { r =>
      val arr = if (r.getBoolean(0)) tc else rc
      arr(r.getLong(1).toInt) += r.getLong(2)
    }
    val bigT = tc.sum
    val bigR = rc.sum
    val b = dsirBuckets.toLong
    val w: Array[Long] = Array.tabulate(dsirBuckets) { i =>
      (tc(i) + 1L) * (bigR + b) - (rc(i) + 1L) * (bigT + b)
    }
    val warr = typedlit(w.toSeq)
    // Raw-pool mean threshold, exact from the model counts: every raw
    // token lands in exactly one bucket, so the raw score total is
    // Σ_b rc[b]·w[b]; the denominator counts ALL raw docs (token-less
    // docs score 0 but still widen the pool).
    val sumRaw = (0 until dsirBuckets).map(i => rc(i) * w(i)).sum
    val nRaw = docs.where(!targetFilter).count()

    toks.select(col("doc_id"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => acc + element_at(warr, (bucket(t) + 1L).cast("int")))
          .as("dsir_score"),
        col("in_target"))
      .withColumn("keep",
        !col("in_target") && col("dsir_score") * nRaw > sumRaw)
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
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("source"))
      .orderBy(quality(col("text")).desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        row_number().over(win).cast("long").as("src_rank"))
      .where(col("src_rank") <= cap)
  }

  /** Deterministic sharded epoch shuffle — the training-order step: every
    * document gets a pseudo-random shard and a position within that shard,
    * both pure functions of (seed, doc_id), so every epoch's order is
    * reproducible and a data loader can stream shard files sequentially.
    *
    * key = md5("epoch:<seed>:<doc_id>"); shard = first-byte(key) mod
    * numShards; pos = rank of key within the shard.
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
    val key = md5(concat(lit(s"epoch:$seed:"), col("doc_id").cast("string")))
    val shard = conv(substring(key, 1, 2), 16, 10).cast("long") % numShards
    val win = Window.partitionBy(col("shard"))
      .orderBy(col("skey"), col("doc_id"))
    docs.select(col("doc_id"), shard.as("shard"), key.as("skey"))
      .select(col("doc_id"), col("shard"),
        row_number().over(win).cast("long").as("pos"))
  }
}
