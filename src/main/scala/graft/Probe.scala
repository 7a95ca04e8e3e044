package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling probe: stage-level timing for the dedup pipeline.
  * Not part of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tm[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[$tag] ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println("docs=" + docs.count())
    docs.select(avg(length(col("text"))).as("avgLen"),
      max(length(col("text"))).as("maxLen")).show()

    import graft.operators.Dedup
    // stage 1: shingle parse
    val sets = Dedup.shingleSets(docs, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tm("shingle-parse") { sets.count() }
    tm("avg-shingles") {
      sets.select(avg(size(col("sset"))), sum(size(col("sset")))).show()
    }
    val ex = sets.select(col("doc_id"), explode(col("sset")).as("shingle"))
    // stage 2: signatures (md5 hash + agg)
    val sig = tm("signatures") {
      val s = Dedup.signatures(docs, 3) // recomputes shingles from scratch
      s.write.format("noop").mode("overwrite").save(); s
    }
    // stage 2b: signatures over persisted sets
    tm("signatures-from-cached-explode") {
      ex.select(col("doc_id"),
        md5(concat(lit("a:"), col("shingle"))).as("ma"),
        md5(concat(lit("b:"), col("shingle"))).as("mb"))
        .groupBy(col("doc_id"))
        // Aggregate BOTH hash families — with only ma consumed, column
        // pruning would eliminate the mb md5 and this stage would time
        // half the hashing stage 2 does.
        .agg(min(substring(col("ma"), 1, 8)).as("h0"),
          min(substring(col("mb"), 1, 8)).as("h4"))
        .write.format("noop").mode("overwrite").save()
    }
    // stage 3: full pairs
    tm("minhashNearDups-total") {
      val p = Dedup.minhashNearDups(docs); println("pairs=" + p.count())
    }
    // Scoped: the property would otherwise leak into every later stage
    // AND across runMain invocations in a warm sbt shell.
    sys.props("graft.debug") = "1"
    try tm("dupClusters-total") {
      val c = Dedup.minhashClusters(docs); println("clusters=" + c.count())
    } finally sys.props.remove("graft.debug")
    sets.unpersist()
    // ngram stages
    tm("ngramJaccardPairs-total") {
      val p = Dedup.ngramJaccardPairs(docs); println("npairs=" + p.count())
    }
    tm("simhashNearDups-total") {
      val p = Dedup.simhashNearDups(docs); println("spairs=" + p.count())
    }
    // Bench parity: noop write computes every output column.
    tm("simhash-signatures-noop") {
      Dedup.simhashes(docs).write.format("noop").mode("overwrite").save()
    }
    tm("simhashNearDups-noop") {
      Dedup.simhashNearDups(docs, maxDist = 6)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
