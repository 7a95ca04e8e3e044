package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DedupIndex, ExactDedupIndex}

/** Runnable ingest-dedup lifecycle over BOTH persisted dedup tiers —
  * the production shape: every ingest batch is screened against what is
  * already at rest, byte-identical copies first (cheap, exact), then
  * near-duplicates (MinHash-LSH), and the indexes absorb the batch as a
  * new generation afterwards.
  *
  *  1. `ExactDedupIndex.buildIndex` — distinct content hashes at rest,
  *     bucket-partitioned, plus a Bloom filter in one meta row;
  *  2. `ExactDedupIndex.indexClean` — per-batch keep/drop verdicts with
  *     ZERO base scans: the broadcast bloom kills provably-fresh rows
  *     map-side, survivors verify against literal-pruned hash buckets;
  *  3. `DedupIndex.buildDedupIndex` + `dedupIndexPairs` — the near-dup
  *     tier over LSH buckets and shingle sets at rest (two pruned
  *     reads, no full base scan either);
  *  4. both indexes `append` the surviving batch (atomic manifest
  *     commit; append ≡ rebuild exactly on both tiers) and `compact`
  *     back to one generation when the history grows.
  *
  * Usage: `runMain graft.examples.DedupServing [sfDir]`
  * (default /root/testdata/sf0.001; index dirs are temp).
  */
object DedupServing {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val xdxDir = java.nio.file.Files
      .createTempDirectory("graft_ex_xdx").toString
    val ddxDir = java.nio.file.Files
      .createTempDirectory("graft_ex_ddx").toString

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.filter(col("doc_id") % 10 =!= 7)
    // The ingest batch: the organic % 10 == 7 slice plus re-identified
    // copies of base docs — the exact tier must catch the copies.
    val batch = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") % 13 === 2 && col("doc_id") % 10 =!= 7)
        .select((col("doc_id") + (1L << 40)).as("doc_id"), col("text")))

    // ---- exact tier -----------------------------------------------------
    ExactDedupIndex.buildIndex(base, xdxDir)
    println(s"[dedup] exact index built over ${base.count()} docs")
    val verdicts = ExactDedupIndex.indexClean(spark, xdxDir, batch)
    verdicts.groupBy(col("in_base"), col("keep")).count()
      .orderBy(col("in_base"), col("keep")).show()
    val kept = batch.join(
      verdicts.where(col("keep")).select(col("doc_id")), Seq("doc_id"))
    println(s"[dedup] exact tier kept ${kept.count()} of ${batch.count()}")

    // ---- near-dup tier over the exact survivors --------------------------
    DedupIndex.buildDedupIndex(base, ddxDir)
    val pairs = DedupIndex.dedupIndexPairs(spark, ddxDir, kept)
    println("[dedup] near-dup pairs (vs base or within batch):")
    pairs.orderBy(col("doc_a"), col("doc_b")).show(10)

    // ---- absorb the batch: append, then compact ---------------------------
    ExactDedupIndex.appendToIndex(kept, xdxDir)
    DedupIndex.appendToDedupIndex(kept, ddxDir)
    println("[dedup] batch absorbed as a new generation on both tiers")
    // A replayed batch is now all-dup on the exact tier (idempotence).
    val replay = ExactDedupIndex.indexClean(spark, xdxDir, kept)
    println(s"[dedup] replayed batch: " +
      s"${replay.where(col("in_base")).count()} of ${replay.count()} " +
      "flagged already-ingested")
    ExactDedupIndex.compactIndex(spark, xdxDir)
    DedupIndex.compactDedupIndex(spark, ddxDir)
    println("[dedup] compacted both indexes back to one generation")

    // ---- takedown (round 14): exact retraction without a rebuild ----------
    // A content-removal order arrives for one ingested document: its
    // TEXT leaves the exact tier (hash tombstone) and the DOCUMENT
    // leaves the near-dup tier (doc-id tombstone). Serves stop seeing
    // it immediately; compaction later purges the rows physically.
    // MATERIALIZED first: `kept` is a lazy plan over the ORIGINAL
    // generation's verdicts, and the append+compact above are two
    // commits past it — re-evaluating it here would read generation
    // dirs the sweep's one-commit reader grace has already collected.
    // (A reader frame must not outlive the grace window; collect what
    // you need and rebuild a literal frame.)
    val tdRow = kept.select(col("doc_id"), col("text"))
      .limit(1).collect().head
    val tdId = tdRow.getLong(0)
    val takedown = Seq((tdId, tdRow.getString(1))).toDF("doc_id", "text")
    ExactDedupIndex.retractFromIndex(takedown, xdxDir)
    DedupIndex.retractFromDedupIndex(takedown, ddxDir)
    val after = ExactDedupIndex.indexClean(spark, xdxDir, takedown)
    println(s"[dedup] doc $tdId after takedown: " +
      s"in_base=${after.select(col("in_base")).head().getBoolean(0)} " +
      "(content no longer reads as ingested)")
    ExactDedupIndex.compactIndex(spark, xdxDir)
    DedupIndex.compactDedupIndex(spark, ddxDir)
    println("[dedup] takedown compacted: tombstones purged on both tiers")

    spark.stop()
  }
}
