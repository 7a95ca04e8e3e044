package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling probe: stage-level timing for
  * [[graft.operators.Curation.curationReport]] — mirrors the function's
  * internal stage structure (base write, five gates, final join) so a
  * regression can be attributed to ONE stage instead of re-guessing from
  * the end-to-end number. Not part of the driver contract.
  */
object ProbeReport {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Curation, Dedup, TextAnalysis}

    def tm[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[$tag] ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }

    // Same planted inputs as the registered query.
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 11 === 0,
          concat(lit("planted dup block "), (col("doc_id") % 4).cast("string")))
          .otherwise(col("text")))
    val coin = substring(
      md5(concat(lit("eval:"), col("doc_id").cast("string"))), 1, 2)
    val train = raw.filter(coin >= "10")
    val evalDocs = raw.filter(coin < "10")

    // End-to-end reference: warm once, then timed.
    tm("full-report-warm") {
      Curation.curationReport(train, evalDocs)
        .write.format("noop").mode("overwrite").save()
    }
    tm("full-report") {
      Curation.curationReport(train, evalDocs)
        .write.format("noop").mode("overwrite").save()
    }

    // Stage mirror (the function body, instrumented). try/finally like
    // curationReport itself: a failed stage must not leak the
    // corpus-sized scratch dirs into the warehouse.
    val baseRaw = train.where(col("doc_id").isNotNull)
      .select(col("doc_id"), col("lang"),
        length(col("text")).as("chars"),
        md5(coalesce(col("text"), lit(""))).as("th"),
        TextAnalysis.wsTokens(col("text")).as("toks"))
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val basePath = s"${wh.stripSuffix("/")}/graft_probe_report_base"
    val setsPath = s"$basePath-sets"
    try {
    tm("base-write") {
      baseRaw.write.mode("overwrite").parquet(basePath)
    }
    val base = spark.read.parquet(basePath)
    tm("gate-q-gopher") {
      Curation.gopherQualityFromTokens(base)
        .select(col("doc_id"), col("keep").as("q_keep"))
        .write.format("noop").mode("overwrite").save()
    }
    val eg = Dedup.exactGroupsFromHashes(
      base.select(col("doc_id"), col("th").as("text_hash")))
    tm("gate-e-exact") {
      base.select(col("doc_id"), col("th"))
        .join(eg, col("th") === col("text_hash"))
        .select(col("doc_id"), (col("doc_id") === col("keep_id")).as("e_keep"))
        .write.format("noop").mode("overwrite").save()
    }
    tm("sets3-write") {
      Dedup.shingleSetsFromTokens(base, 3)
        .write.mode("overwrite").parquet(setsPath)
    }
    val sets3 = spark.read.parquet(setsPath)
    val pairs = tm("pairs-minhash") {
      val p = Dedup.minhashNearDupsFromSets(sets3)
      p.write.format("noop").mode("overwrite").save(); p
    }
    tm("gate-c-clusters") {
      Dedup.dupClusters(base.select(col("doc_id")), pairs)
        .select(col("doc_id"), (col("cluster") === col("doc_id")).as("c_keep"))
        .write.format("noop").mode("overwrite").save()
    }
    tm("gate-d-decontam") {
      Curation.decontaminateFromSets(
          Dedup.shingleSetsFromTokens(base, Curation.DecontamGramSize),
          evalDocs, Curation.DecontamGramSize)
        .select(col("doc_id"), (!col("contaminated")).as("d_keep"))
        .write.format("noop").mode("overwrite").save()
    }
    tm("gate-s-sample") {
      base.select(col("doc_id"),
          Curation.sampleKeep(Map("en" -> 0.5, "zh" -> 0.125), 0.25)
            .as("s_keep"))
        .write.format("noop").mode("overwrite").save()
    }
    } finally {
      // Cleanup the probe scratch on every exit path.
      for (p <- Seq(setsPath, basePath)) {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(hp, true)
      }
    }
    spark.stop()
  }
}
