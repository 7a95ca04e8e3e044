package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.TrendCollection
import graft.model.TrendConfig
import graft.sources.EventAdapter

/** Runnable port of the reference's example app (examples/index.js):
  * consume a recentchange feed and render the three trend boards — most
  * vibrant (bias), biggest movers (bytesChanged), most edited
  * (editsPerMinute) — top-5 each.
  *
  * Usage: `runMain graft.examples.TrendingBoard [captureLog]`
  *  - with a `captureLog` argument: replay an SSE JSONL capture (the file
  *    [[graft.sources.sse.SseWriter]] appends) through the `graft-sse`
  *    source + wire decode — the example's live-socket path, minus the
  *    network (reference `new WikiSocketCollection({project: …})`).
  *  - without: run the boards over the driver-testdata events table.
  *
  * The reference renders on a 10-second `setInterval` over mutable state;
  * here each render is a snapshot query over the same aggregation
  * (`TrendCollection` Q1/Q3), so the example doubles as the batch-vs-
  * reference parity demo.
  */
object TrendingBoard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-trending-board")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = args.headOption match {
      case Some(log) =>
        EventAdapter.decodeWire(
          spark.read.format("graft-sse").option("path", log).load())
      case None =>
        EventAdapter.recentChanges(spark, "/root/testdata/sf0.001")
    }
    // Relaxed eviction so a short capture keeps its pages on the boards
    // (the reference demo uses minSpeed 5 against the live firehose).
    val cfg = TrendConfig(minSpeed = 0.0, maxInactivityMins = 1000000,
      maxLifespanMins = 1000000)
    // as-of defaults to the collection's memoized max event ts — an
    // explicit max(ts) scan here would run the identical job twice.
    val coll = TrendCollection(spark, events, cfg)

    val line = "###########################"
    def render(title: String, board: org.apache.spark.sql.DataFrame): Unit = {
      println(s"$line\n### $title ###\n$line")
      board.collect().foreach(r => println(r.mkString("  ")))
    }
    render("Most vibrant", coll.topByBias(5))
    render("Biggest movers", coll.topByBytesChanged(5))
    render("Most edited", coll.topByEditsPerMinute(5))
    spark.stop()
  }
}
