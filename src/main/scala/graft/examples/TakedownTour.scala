package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupIndex, ExactDedupIndex, MediaIndex,
  Multimodal, Search, Similarity, StatsIndex, TextAnalysis}

/** The operator-facing TAKEDOWN story, walked across ALL SIX persisted
  * index families — the loop a right-to-be-forgotten order actually
  * drives, end to end per family:
  *
  *   retract (one atomic tombstone/negation commit; serves stop seeing
  *   the content immediately) → takedown-pressure census (live/dead +
  *   exact-ppm dead share — the compact-now signal) → compact (dead
  *   rows physically purged; exact-dedup additionally REBUILDS its
  *   bloom over the survivors) → census again (all-live).
  *
  * Families and their takedown units:
  *   - exact-dedup index: CONTENT hashes (a takedown order names text);
  *   - minhash dedup index: doc ids (per-doc pairing power);
  *   - media index: doc ids over perceptual block keys;
  *   - lexical BM25 index: doc ids + a DECREMENTED stats row in the
  *     same commit (df/N/avgdl recompute from live postings);
  *   - ANN IVF index: vec ids (search-after-retract ≡ frozen-book
  *     rebuild);
  *   - stats index: NEGATED partial sums (retraction ≡ arithmetic — no
  *     tombstone resolution at all, the one family where a census of
  *     tombstones is replaced by `neg_cells` in its health report).
  *
  * Usage: `runMain graft.examples.TakedownTour [sfDir]`
  * (default /root/testdata/sf0.001; index dirs are temp).
  */
object TakedownTour {

  private def show(label: String, df: DataFrame, n: Int = 5): Unit = {
    println(s"--- $label")
    df.show(n, truncate = false)
  }

  /** The tour body, factored so the smoke spec can drive it on the test
    * session. Returns the six post-compact live counts (spec assertion
    * surface). `takedown` selects the doc slice to remove.
    *
    * The six temp index dirs are deleted in a finally — the smoke spec
    * drives this in the suite, and without cleanup repeated test runs
    * accumulate orphan index dirs under the system temp root.
    */
  def run(spark: SparkSession, sfDir: String): Map[String, Long] =
    ExampleTmp.withTrackedTempDirs(spark, "takedown-tour")(
      runBody(spark, sfDir, _))

  private def runBody(spark: SparkSession, sfDir: String,
      tmp: String => String): Map[String, Long] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // One slice for every doc-keyed family; each family intersects it
    // with ITS ingested membership (token-less docs never reached the
    // lex/dedup tables; sub-frame payloads never reached the media one).
    val slice = col("doc_id") % 10 === 6

    // ---- exact-dedup (content-hash tombstones + bloom rebuild) ---------
    val xdx = tmp("graft_tour_xdx")
    ExactDedupIndex.buildIndex(docs, xdx)
    ExactDedupIndex.retractFromIndex(docs.filter(slice), xdx)
    show("exact-dedup census after takedown (dead hashes still hold "
      + "bloom bits)", ExactDedupIndex.takedownHealth(spark, xdx))
    ExactDedupIndex.compactIndex(spark, xdx)
    val xdxCensus = ExactDedupIndex.takedownHealth(spark, xdx)
    show("exact-dedup census after compact (bloom REBUILT over "
      + "survivors)", xdxCensus)
    val xdxLive = xdxCensus.head().getAs[Long]("live_hashes")

    // ---- minhash dedup (doc-keyed tombstones) ---------------------------
    val ddx = tmp("graft_tour_ddx")
    DedupIndex.buildDedupIndex(docs, ddx)
    DedupIndex.retractFromDedupIndex(
      docs.filter(slice &&
        size(TextAnalysis.wsTokens(col("text"))) > 0), ddx)
    show("dedup census after takedown",
      DedupIndex.takedownHealth(spark, ddx))
    DedupIndex.compactDedupIndex(spark, ddx)
    val ddxCensus = DedupIndex.takedownHealth(spark, ddx)
    show("dedup census after compact", ddxCensus)
    val ddxLive = ddxCensus.head().getAs[Long]("live_docs")

    // ---- media (perceptual block keys, doc-keyed) -----------------------
    val mdx = tmp("graft_tour_mdx")
    val payloads = Multimodal.withPayload(docs)
    MediaIndex.buildMediaIndex(payloads, mdx)
    MediaIndex.retractFromMediaIndex(
      payloads.filter(slice && length(col("payload")) >= 16), mdx)
    show("media census after takedown",
      MediaIndex.takedownHealth(spark, mdx))
    MediaIndex.compactMediaIndex(spark, mdx)
    val mdxCensus = MediaIndex.takedownHealth(spark, mdx)
    show("media census after compact", mdxCensus)
    val mdxLive = mdxCensus.head().getAs[Long]("live_docs")

    // ---- lexical BM25 (doc tombstones + stats decrement in ONE commit) --
    val lex = tmp("graft_tour_lex")
    Search.buildLexIndex(docs, lex, buckets = 16)
    Search.retractFromLexIndex(
      docs.filter(slice &&
        size(TextAnalysis.wsTokens(col("text"))) > 0), lex)
    show("lex census after takedown", Search.takedownHealth(spark, lex))
    Search.compactLexIndex(spark, lex)
    val lexCensus = Search.takedownHealth(spark, lex)
    show("lex census after compact", lexCensus)
    val lexLive = lexCensus.head().getAs[Long]("live_docs")

    // ---- ANN IVF (vec-keyed tombstones) ---------------------------------
    val ivf = tmp("graft_tour_ivf")
    Similarity.buildIvfIndex(emb, ivf, clusters = 8, iters = 2)
    Similarity.retractFromAnnIndex(emb.filter(col("vec_id") % 10 === 6),
      ivf)
    show("ANN per-cell takedown pressure (dead rows until compact)",
      Similarity.takedownHealth(spark, ivf))
    Similarity.compactIndex(spark, ivf)
    val ivfCensus = Similarity.takedownHealth(spark, ivf)
    show("ANN per-cell census after compact", ivfCensus)
    val ivfLive = ivfCensus.agg(sum(col("live_vecs"))).head().getLong(0)

    // ---- stats index (negated partial sums — arithmetic retraction) -----
    val stx = tmp("graft_tour_stx")
    StatsIndex.buildStatsIndex(docs, stx)
    StatsIndex.retractFromStatsIndex(docs.filter(slice), stx)
    show("stats cells after retraction (sums net out the slice exactly)",
      StatsIndex.statsCells(spark, stx))
    show("stats health (neg_cells = this family's takedown signal)",
      StatsIndex.indexHealth(spark, stx))
    val stxDocs = StatsIndex.statsCells(spark, stx)
      .agg(sum(col("n_docs"))).head().getLong(0)

    Map("exact" -> xdxLive, "dedup" -> ddxLive, "media" -> mdxLive,
      "lex" -> lexLive, "ivf" -> ivfLive, "stats" -> stxDocs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val live = run(spark, sfDir)
    println(s"[takedown-tour] post-compact live counts: $live")
    spark.stop()
  }
}
