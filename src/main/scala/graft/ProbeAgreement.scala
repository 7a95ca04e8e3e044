package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling probe: action-level timing for
  * [[graft.operators.TextAnalysis.scoreAgreement]]'s registered query —
  * splits the end-to-end number into the input chain, the boundary
  * sketch, the bucket-count row, and the rank+tail job so a regression
  * attributes to ONE action. Not part of the driver contract.
  */
object ProbeAgreement {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextAnalysis

    def tm[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[$tag] ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cols = Seq("lm_micro", "quality", "n_chars")
    def scores() = {
      val lm = TextAnalysis.bigramLmScores(docs)
        .select(col("doc_id"), col("lm_micro"))
      val qs = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        col("n_chars"))
      qs.join(lm, Seq("doc_id"))
    }

    tm("full-query-warm") {
      TextAnalysis.scoreAgreement(scores(), cols)
        .write.format("noop").mode("overwrite").save()
    }
    tm("full-query") {
      TextAnalysis.scoreAgreement(scores(), cols)
        .write.format("noop").mode("overwrite").save()
    }
    tm("input-construct") { scores() } // bigram-LM internal barriers
    val s = tm("input-construct2") { scores() }
    val cached = s.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tm("input-materialize") { cached.count() }
    val probs = (1 until 64).map(_.toDouble / 64).toArray
    val bounds = tm("boundary-sketch") {
      cached.stat.approxQuantile(cols.toArray, probs, 0.01)
    }
    tm("count-row") {
      val exprs = cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"))
      }
      cached.agg(exprs.head, exprs.tail: _*).head()
    }
    tm("ranks-and-tail") {
      TextAnalysis.scoreAgreement(cached, cols)
        .write.format("noop").mode("overwrite").save()
    }
    val ranked = tm("binned-ranks-build") { // quantile + count actions
      TextAnalysis.binnedRanks(cached, cols, 64)
    }
    tm("ranked-noop") {
      ranked.select(col("doc_id") +: cols.map(c => col(s"__r_$c")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    tm("ranks-and-tail-2") {
      TextAnalysis.scoreAgreement(cached, cols)
        .write.format("noop").mode("overwrite").save()
    }
    println("bounds sizes: " + bounds.map(_.length).mkString(","))
    cached.unpersist(blocking = false)
    spark.stop()
  }
}
