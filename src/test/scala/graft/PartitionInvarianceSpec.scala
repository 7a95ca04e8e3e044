package graft

/** Direct test of the engine-wide determinism claim: a registered
  * query's RESULT never depends on the physical layout — shuffle
  * partition count, scan split size, or AQE's runtime coalescing. Every
  * emitted double is either integer-derived or floor/half-up-quantized
  * from a shuffle-order-free aggregate, so two runs under radically
  * different parallelism must agree BIT-FOR-BIT, not just approximately.
  *
  * The picked queries cover the determinism-sensitive families: decimal
  * money sums (q1), integer-mean LM scoring (bigram_lm), fixed-point
  * centroid updates (kmeans_iter), md5-seeded LSH pairs (minhash), the
  * per-partition Misra-Gries candidates whose exact recount must erase
  * the layout (heavy_tokens — the one operator whose INTERMEDIATE state
  * is layout-dependent by design), rational top-k ranking (pmi), the
  * per-user array fold (funnel), Spearman rank agreement — whose binned
  * ranks are the sharpest case here: approxQuantile BOUNDARIES vary with
  * the layout while the exact ranks they produce must not — the
  * driver-book subword scorer, the prefix-filter join, the perceptual
  * frame histograms (typed mapPartitions kernel), and the order-2
  * transition contexts.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val queries = Seq(
    "q1_agg", "doc_bigram_lm", "doc_pmi_topk", "doc_heavy_tokens",
    "emb_kmeans_iter", "doc_minhash_pairs", "events_funnel_steps",
    "doc_score_agreement", "doc_subword_stats", "doc_prefix_jaccard",
    "doc_media_pdups", "events_transitions2",
    // The distributed bloom build is a bitwise-OR fold over per-split
    // partial bitmaps — commutative, so the FILTER (and with it which
    // rows take the verify path) must not depend on the scan layout,
    // and the exact verify erases any residual difference.
    "doc_bloom_clean", "doc_freq_spectrum")

  private def runAll(parts: String, maxBytes: String)
      : Map[String, Seq[String]] = {
    val conf = spark.conf
    val p0 = conf.get("spark.sql.shuffle.partitions")
    val b0 = conf.get("spark.sql.files.maxPartitionBytes")
    conf.set("spark.sql.shuffle.partitions", parts)
    conf.set("spark.sql.files.maxPartitionBytes", maxBytes)
    try queries.map { q =>
      q -> SparkEntry.queries(q)(spark, sf).collect()
        .map(_.toString).sorted.toSeq
    }.toMap
    finally {
      conf.set("spark.sql.shuffle.partitions", p0)
      conf.set("spark.sql.files.maxPartitionBytes", b0)
    }
  }

  test("results are bit-identical under different shuffle and scan layouts") {
    // 3 shuffle partitions + 128 KiB scan splits vs 17 + 128 MiB: every
    // exchange, scan boundary, and AQE decision differs between the runs.
    val a = runAll("3", "131072")
    val b = runAll("17", "134217728")
    for (q <- queries) {
      assert(a(q).nonEmpty, s"$q returned no rows — a vacuous comparison")
      assert(a(q) == b(q),
        s"$q differs across physical layouts:\n  3p: ${a(q).take(3)}\n  17p: ${b(q).take(3)}")
    }
  }
}
