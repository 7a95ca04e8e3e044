package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Multimodal

/** Runnable tour of the multimodal column family — the media half of a
  * crawl pipeline, end to end over stub-codec payloads:
  *
  *  1. `mediaMeta` — batch decode contract (dimensions, checksum) via the
  *     mapPartitions batch iterator;
  *  2. `resizeThumbs` / `sampleFrames` / `frameFeatures` — the
  *     resize / frame-sample / feature-extract stages (frames never
  *     leave their scanning executor);
  *  3. `frameDups` — FIRST dedup pass: byte-identical sampled frames
  *     (md5 fingerprints, df-capped pair join) — catches rips;
  *  4. `perceptualDups` — SECOND pass: intensity-histogram fingerprints
  *     catch the pixel-permuted (rotated) copies md5 is blind to;
  *  5. `streamingPerceptualDups` — the same perceptual kernel at INGEST
  *     time: an alert stream of (doc, base, shared) pairs against the
  *     frozen corpus, stateless, exactly-once per pair per delivery.
  *
  * The demo plants one rotated pair so steps 3 and 4 visibly disagree:
  * the byte pass must NOT pair them, the perceptual pass must.
  *
  * Usage: `runMain graft.examples.MediaPipeline [sfDir]`
  * (default /root/testdata/sf0.001).
  */
object MediaPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Plant a rotated pair: doc B = doc A's pattern with every SAMPLED
    // frame (each 64-byte block's first 16 bytes) reversed — a 180°
    // rotation under the stub's bytes-are-pixels decode.
    val blocks = (0 until 3).map(b => "A" * (4 + b) + "P" * (12 - b) + "Q" * 48)
    val orig = blocks.mkString
    val rot = blocks.map(b => b.take(16).reverse + b.drop(16)).mkString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") === 11L, concat(lit(orig), col("text")))
          .when(col("doc_id") === 23L, concat(lit(rot), col("text")))
          .otherwise(col("text")))
    val payloads = Multimodal.withPayload(docs)

    println("[media] decode metadata (stub codec, real batch contract):")
    Multimodal.mediaMeta(spark, docs).show(5)

    println("[media] aspect-fit thumbs (stride stub, maxDim^2 bound):")
    Multimodal.resizeThumbs(spark, payloads).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        length(col("thumb")).as("thumb_len")).show(5)

    println("[media] per-frame features (4-bin histogram stand-in):")
    Multimodal.frameFeatures(spark, payloads).toDF().show(5)

    println("[media] byte-identical frame dups (md5 — the rip catcher):")
    val byteDups = Multimodal.frameDups(spark, payloads)
    byteDups.orderBy(col("doc_a"), col("doc_b")).show(10)
    val rotatedInByte = byteDups
      .where(col("doc_a") === 11L && col("doc_b") === 23L).count()
    println(s"[media] rotated pair (11, 23) in the BYTE pass: " +
      s"$rotatedInByte row(s) — md5 is blind to rotation")

    println("[media] perceptual dups (histogram — the rotation catcher):")
    val pDups = Multimodal.perceptualDups(spark, payloads)
    pDups.orderBy(col("doc_a"), col("doc_b")).show(10)
    val rotatedInP = pDups
      .where(col("doc_a") === 11L && col("doc_b") === 23L).count()
    println(s"[media] rotated pair (11, 23) in the PERCEPTUAL pass: " +
      s"$rotatedInP row(s)")

    println("[media] ingest-time alert stream vs the frozen corpus:")
    val ms = MemoryStream[(Long, Array[Byte])](spark)
    val alerts = Multimodal.streamingPerceptualDups(
      spark, payloads, ms.toDF().toDF("doc_id", "payload"))
    val q = alerts.writeStream.format("memory").queryName("media_alerts")
      .outputMode("append").start()
    try {
      // A fresh rotated copy arrives at ingest — it must alert against
      // BOTH planted base docs (same histograms), exactly once each.
      ms.addData(Seq((900001L, rot.getBytes("UTF-8"))))
      q.processAllAvailable()
    } finally q.stop()
    spark.table("media_alerts")
      .orderBy(col("doc_id"), col("base_id")).show(10)
    spark.stop()
  }
}
