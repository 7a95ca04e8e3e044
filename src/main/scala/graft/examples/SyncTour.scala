package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, DedupIndex, ExactDedupIndex, MediaIndex,
  Multimodal, Search, Similarity, StatsIndex}

/** The operator-facing DAILY-INGEST story, walked across every persisted
  * index family that ships an incremental sync — the loop a nightly
  * crawl refresh actually drives, end to end per family:
  *
  *   corpusDiff(v1, v2) (what did the crawl change?) →
  *   syncX(v1, v2) (retract removed/changed, append added/changed — at
  *   most two atomic commits; serves equal a rebuild over v2 EXACTLY)
  *   → takedown census (the sync's retraction half leaves tombstones /
  *   negated sums until compaction) → compact → census again.
  *
  * Families and their sync units (see each operator's scaladoc for the
  * torn-sync recovery contract):
  *   - exact-dedup index: CONTENT hashes — set-difference sync, the one
  *     RESUMABLE member (re-running a torn or completed sync is safe);
  *   - minhash dedup index: doc ids (per-ROW liveness: a changed doc's
  *     old generation dies with its tombstone, the re-ingest outlives);
  *   - lexical BM25 index: doc ids + stats decrement in one commit
  *     (df/N/avgdl recompute from live postings);
  *   - media index: doc ids diffed by PAYLOAD BYTES (corpusDiffBy);
  *   - ANN IVF index: vec ids diffed by VECTOR VALUE, frozen-book
  *     re-encode of the append leg;
  *   - stats index: (lang, source, text) cell identity — negated-sum
  *     retraction, arithmetic exactness.
  *
  * Usage: `runMain graft.examples.SyncTour [sfDir]`
  * (default /root/testdata/sf0.001; index dirs are temp and deleted).
  */
object SyncTour {

  private def show(label: String, df: DataFrame, n: Int = 5): Unit = {
    println(s"--- $label")
    df.show(n, truncate = false)
  }

  /** The tour's v1 → v2 snapshot transform (the registered sync
    * queries' classes): remove the % 31 == 10 slice, rewrite % 17 == 11
    * texts with a ' v2' suffix, add +2^40-id copies of the % 20 == 7
    * docs.
    */
  private def v2Of(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 31 =!= 10)
      .withColumn("text",
        when(col("doc_id") % 17 === 11,
          concat(coalesce(col("text"), lit("")), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 20 === 7)
        .withColumn("doc_id", col("doc_id") + lit(1L << 40)))

  /** The tour body, factored so the smoke spec can drive it. Returns
    * the per-family post-compact live counts. Temp index dirs are
    * deleted in a finally (the TakedownTour discipline).
    */
  def run(spark: SparkSession, sfDir: String): Map[String, Long] =
    ExampleTmp.withTrackedTempDirs(spark, "sync-tour")(
      runBody(spark, sfDir, _))

  private def runBody(spark: SparkSession, sfDir: String,
      tmp: String => String): Map[String, Long] = {
    val v1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val v2 = v2Of(v1)

    // THE DIFF is the shared entry point: every sync below re-derives
    // this classification internally on its own identity unit.
    show("corpusDiff(v1, v2) — the transition a nightly refresh sees",
      Curation.corpusDiff(v1, v2)
        .groupBy(col("status")).agg(count(lit(1)).as("n_docs")))

    // ---- exact-dedup (content-hash set difference; RESUMABLE) ----------
    val xdx = tmp("graft_synctour_xdx")
    ExactDedupIndex.buildIndex(v1, xdx)
    ExactDedupIndex.syncIndex(v1, v2, xdx)
    show("exact-dedup census after sync (dead = v1-only hashes)",
      ExactDedupIndex.takedownHealth(spark, xdx))
    // Resumability: re-running the SAME sync is a complete no-op.
    ExactDedupIndex.syncIndex(v1, v2, xdx)
    ExactDedupIndex.compactIndex(spark, xdx)
    val xdxLive = ExactDedupIndex.takedownHealth(spark, xdx)
      .head().getAs[Long]("live_hashes")

    // ---- minhash dedup (doc-keyed retract/append lifecycle) ------------
    val ddx = tmp("graft_synctour_ddx")
    DedupIndex.buildDedupIndex(v1, ddx)
    DedupIndex.syncDedupIndex(v1, v2, ddx)
    show("dedup census after sync", DedupIndex.takedownHealth(spark, ddx))
    DedupIndex.compactDedupIndex(spark, ddx)
    val ddxLive = DedupIndex.takedownHealth(spark, ddx)
      .head().getAs[Long]("live_docs")

    // ---- lexical BM25 (doc tombstones + stats in one commit) -----------
    val lex = tmp("graft_synctour_lex")
    Search.buildLexIndex(v1, lex, buckets = 16)
    Search.syncLexIndex(v1, v2, lex)
    show("lex census after sync", Search.takedownHealth(spark, lex))
    Search.compactLexIndex(spark, lex)
    val lexLive = Search.takedownHealth(spark, lex)
      .head().getAs[Long]("live_docs")

    // ---- media (payload-byte diff via corpusDiffBy) ---------------------
    val mdx = tmp("graft_synctour_mdx")
    val pay1 = Multimodal.withPayload(v1)
    MediaIndex.buildMediaIndex(pay1, mdx)
    MediaIndex.syncMediaIndex(pay1, Multimodal.withPayload(v2), mdx)
    show("media census after sync", MediaIndex.takedownHealth(spark, mdx))
    MediaIndex.compactMediaIndex(spark, mdx)
    val mdxLive = MediaIndex.takedownHealth(spark, mdx)
      .head().getAs[Long]("live_docs")

    // ---- ANN IVF (vector-value diff, frozen-book re-encode) -------------
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embV1 = emb.filter(col("vec_id") % 10 =!= 7)
    val embV2 = emb.filter(col("vec_id") % 20 =!= 4)
    val ivf = tmp("graft_synctour_ivf")
    Similarity.buildIvfIndex(embV1, ivf, clusters = 8, iters = 2)
    Similarity.syncAnnIndex(embV1, embV2, ivf)
    show("ANN per-cell takedown pressure after sync",
      Similarity.takedownHealth(spark, ivf))
    Similarity.compactIndex(spark, ivf)
    val ivfLive = Similarity.takedownHealth(spark, ivf)
      .agg(sum(col("live_vecs"))).head().getLong(0)

    // ---- stats index (cell-identity diff, negated-sum retraction) -------
    val stx = tmp("graft_synctour_stx")
    StatsIndex.buildStatsIndex(v1, stx)
    StatsIndex.syncStatsIndex(v1, v2, stx)
    show("stats cells after sync (sums net the transition exactly)",
      StatsIndex.statsCells(spark, stx))
    StatsIndex.compactStatsIndex(spark, stx)
    val stxDocs = StatsIndex.statsCells(spark, stx)
      .agg(sum(col("n_docs"))).head().getLong(0)

    Map("exact" -> xdxLive, "dedup" -> ddxLive, "lex" -> lexLive,
      "media" -> mdxLive, "ivf" -> ivfLive, "stats" -> stxDocs)
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
    println(s"[sync-tour] post-compact live counts: $live")
    spark.stop()
  }
}
