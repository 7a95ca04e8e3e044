package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Search

/** Runnable persisted-index lifecycle — build once, serve many, ingest
  * daily, compact when the generation history grows:
  *
  *  1. `buildLexIndex` over the base corpus (bucket-partitioned postings
  *     + a stats table, written stats-last so a torn build is never
  *     readable);
  *  2. `lexIndexTopK` with query-by-example terms — every postings scan
  *     partition-prunes to the query terms' buckets;
  *  3. `appendToLexIndex` with a delta slice (a new generation dir +
  *     additive stats, committed by one atomic manifest rename; append ≡
  *     rebuild exactly);
  *  4. `compactLexIndex` folds the generations back to one dir —
  *     search-before ≡ search-after, bit-identical;
  *  5. `retractFromLexIndex` takes a slice down (tombstone generation +
  *     decremented stats — df/N/avgdl recompute from live postings, so
  *     the takedown ≡ a rebuild over the retained corpus exactly);
  *     `takedownHealth` reads the dead share, and a second compact
  *     physically purges the tombstoned postings.
  *
  * Usage: `runMain graft.examples.SearchServing [sfDir] [indexDir]`
  * (defaults: /root/testdata/sf0.001, a temp dir).
  */
object SearchServing {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val indexDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_lexidx").toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.filter(col("doc_id") % 10 =!= 7)
    val delta = docs.filter(col("doc_id") % 10 === 7)

    Search.buildLexIndex(base, indexDir)
    println(s"[search] built index over ${base.count()} docs at $indexDir")

    // Query by example: the probe docs' first terms, extracted with the
    // driver-side twin of the index's own term window.
    val probes = docs.filter(col("doc_id").isin(1L, 2L, 3L))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        Search.queryByExampleTerms(r.getString(1), 6)).toSeq
    def serve(tag: String): Unit = {
      println(s"[search] top-5 per probe ($tag):")
      Search.lexIndexTopK(spark, indexDir, probes, k = 5,
        excludeSelf = true).orderBy(col("query_id"), col("rank")).show(15)
    }
    serve("base")

    Search.appendToLexIndex(delta, indexDir)
    println(s"[search] appended ${delta.count()} docs (new generation)")
    serve("base+delta")

    Search.compactLexIndex(spark, indexDir)
    println("[search] compacted generations back to one dir")
    serve("compacted — must match base+delta exactly")

    // Takedown: remove a slice (tokenized membership — the caller's
    // contract), watch the census, then compact the dead rows away.
    val takedown = docs.filter(col("doc_id") % 20 === 6 &&
      size(graft.operators.TextAnalysis.wsTokens(col("text"))) > 0)
    Search.retractFromLexIndex(takedown, indexDir)
    println(s"[search] retracted ${takedown.count()} docs (tombstone generation)")
    Search.takedownHealth(spark, indexDir).show()
    serve("after takedown — retracted docs can no longer be neighbors")
    Search.compactLexIndex(spark, indexDir)
    Search.takedownHealth(spark, indexDir).show()
    serve("compacted after takedown — identical to the pre-compact serve")
    spark.stop()
  }
}
