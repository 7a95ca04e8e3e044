package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Runnable end-to-end corpus-curation pipeline — the operators composed
  * into the artifact they exist for: a packed, sharded training corpus on
  * disk plus its audit trail.
  *
  * Stages (each documented at its operator):
  *  1. split an eval slice off the corpus (deterministic md5 coin — the
  *     doc_decontam convention) to decontaminate against;
  *  2. `curationReport` — Gopher quality, exact-dup canonical, near-dup
  *     cluster representative, decontamination, sampling coin; `kept` is
  *     the conjunction and every removal is attributed to a named stage;
  *  3. `mixRatePlan` on the survivors — target token shares → per-language
  *     downsampling rates (collected: a languages-sized map);
  *  4. `stratifiedSample` with those rates (deterministic md5 coin);
  *  5. `writeShards` — the packed corpus as one parquet file per
  *     (lang, shard) in doc_id order — and `shardFilesReport` re-read
  *     from disk as the final audit.
  *
  * Usage: `runMain graft.examples.CurationPipeline [sfDir] [outDir]`
  * (defaults: /root/testdata/sf0.001, a temp dir).
  */
object CurationPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_curated").toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val coin = substring(
      md5(concat(lit("eval:"), col("doc_id").cast("string"))), 1, 2)
    val train = docs.filter(coin >= "10")
    val evalDocs = docs.filter(coin < "10")

    val report = Curation.curationReport(train, evalDocs)
    val stages = report.agg(
      count(lit(1)).as("docs"),
      sum(when(!col("q_keep"), 1L).otherwise(0L)).as("fail_quality"),
      sum(when(!col("e_keep"), 1L).otherwise(0L)).as("fail_exact_dup"),
      sum(when(!col("c_keep"), 1L).otherwise(0L)).as("fail_near_dup"),
      sum(when(!col("d_keep"), 1L).otherwise(0L)).as("fail_contaminated"),
      sum(when(!col("s_keep"), 1L).otherwise(0L)).as("fail_sample"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept")).collect()(0)
    println(s"[curation] ${stages.getAs[Long]("docs")} train docs; removals " +
      s"— quality ${stages.getAs[Long]("fail_quality")}, " +
      s"exact-dup ${stages.getAs[Long]("fail_exact_dup")}, " +
      s"near-dup ${stages.getAs[Long]("fail_near_dup")}, " +
      s"contaminated ${stages.getAs[Long]("fail_contaminated")}, " +
      s"sample-coin(preview) ${stages.getAs[Long]("fail_sample")}; " +
      s"kept(all gates) ${stages.getAs[Long]("kept")}")

    // Content gates only (quality, exact-dup, near-dup, decontamination):
    // sampling is the MIX stage's job below — keeping the report's
    // default-rate coin here would compound two samplers.
    val kept = train.join(
      report.filter(col("q_keep") && col("e_keep") && col("c_keep") &&
        col("d_keep")).select(col("doc_id")), Seq("doc_id"))

    // Mix to target token shares (downsample-only; rates are a
    // languages-sized table, safely collected to a Map for the sampler).
    val targets = Map("en" -> 0.3, "zh" -> 0.3, "de" -> 0.2)
    val plan = Curation.mixRatePlan(kept, targets, defaultTarget = 0.05)
    val rates = plan.collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("sample_rate"))
      .toMap
    println(s"[curation] mix rates: ${rates.toSeq.sortBy(_._1)
      .map { case (l, r) => f"$l=$r%.4f" }.mkString(", ")}")
    val mixed = kept.join(
      Curation.stratifiedSample(kept, rates, defaultRate = 0.0)
        .select(col("doc_id")), Seq("doc_id"))

    Curation.writeShards(mixed, s"$outDir/shards")
    val audit = Curation.shardFilesReport(spark, s"$outDir/shards")
    println(s"[curation] wrote ${audit.count()} shards to $outDir/shards:")
    audit.orderBy(col("lang"), col("shard_id")).show(100, truncate = false)
    spark.stop()
  }
}
