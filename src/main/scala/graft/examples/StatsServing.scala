package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, StatsIndex}

/** Runnable corpus-statistics lifecycle over the persisted stats index —
  * the dashboard/mixing-controller shape: the corpus is aggregated ONCE
  * per ingest event, and every later question ("what does the corpus
  * look like now?") is answered from the tiny tables at rest, never by
  * re-scanning data.
  *
  *  1. `StatsIndex.buildStatsIndex` — one map-side-combined pass over
  *     the base corpus writes the per-(lang, source) cells and the
  *     token-length histogram;
  *  2. `statsCells` / `statsQuantiles` — zero-corpus-scan serves; the
  *     cells feed `Curation.mixRatePlan` to derive per-language
  *     sampling rates, exactly how a mixing controller consumes them;
  *  3. `appendToStatsIndex` — an ingest batch lands as one generation of
  *     partial sums (append ≡ rebuild by commutativity);
  *  4. `retractFromStatsIndex` — a takedown batch lands as NEGATED
  *     partial sums and cancels exactly (no rebuild); health shows the
  *     running row total and flags non-subset retractions;
  *  5. `compactStatsIndex` — folds the generation history to one pair
  *     of tables and physically purges fully-cancelled groups.
  *
  * Usage: `runMain graft.examples.StatsServing [sfDir]`
  * (default /root/testdata/sf0.001; index dir is temp).
  */
object StatsServing {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files
      .createTempDirectory("graft_ex_stx").toString

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.filter(col("doc_id") % 10 =!= 3)
    val batch = docs.filter(col("doc_id") % 10 === 3)

    // ---- build + serve ----------------------------------------------------
    StatsIndex.buildStatsIndex(base, dir)
    println("[stats] cells after the base build:")
    StatsIndex.statsCells(spark, dir)
      .orderBy(col("lang"), col("source")).show(8)

    // The cells ARE the mixing controller's input: token totals per
    // language feed the rate planner without touching the corpus.
    val langTokens = StatsIndex.statsCells(spark, dir)
      .groupBy(col("lang")).agg(sum(col("tokens")).as("tokens"))
    println("[stats] per-language token mass (from the index):")
    langTokens.orderBy(desc("tokens")).show(8)
    println("[stats] mix-rate plan for a 50/25 en/zh token target:")
    Curation.mixRatePlan(base, Map("en" -> 0.5, "zh" -> 0.25)).show(8)

    // ---- ingest: one generation of partial sums ---------------------------
    StatsIndex.appendToStatsIndex(batch, dir)
    println("[stats] quantiles after the ingest (served from the " +
      "histogram at rest):")
    StatsIndex.statsQuantiles(spark, dir)
      .orderBy(col("lang"), col("q")).show(12)

    // ---- takedown: negated sums cancel exactly ----------------------------
    val takedown = docs.filter(col("doc_id") % 10 === 6)
    StatsIndex.retractFromStatsIndex(takedown, dir)
    println(s"[stats] retracted the takedown slice; health after:")
    StatsIndex.indexHealth(spark, dir).show()

    // ---- compact: fold history, purge cancelled groups --------------------
    StatsIndex.compactStatsIndex(spark, dir)
    println("[stats] compacted; health after:")
    StatsIndex.indexHealth(spark, dir).show()

    spark.stop()
  }
}
