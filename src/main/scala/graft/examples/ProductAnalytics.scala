package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Runnable product-analytics tour over the events log — the batch
  * event family composed the way an analyst would drive it: sessions,
  * cohort retention, the ordered conversion funnel, the event-type
  * transition matrix, and the daily rate-spike report.
  *
  * Usage: `runMain graft.examples.ProductAnalytics [sfDir]`
  * (default: /root/testdata/sf0.001).
  */
object ProductAnalytics {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.sources.EventAdapter.readEvents(spark, sfDir)

    val sessions = EventAnalytics.sessionize(events)
    println(s"[events] sessions: ${sessions.count()}; longest by events:")
    sessions.orderBy(col("n_events").desc, col("user_id")).show(5)

    println("[events] cohort retention (first 10 cells):")
    EventAnalytics.cohortRetention(events)
      .orderBy(col("cohort_day"), col("offset_days")).show(10)

    println("[events] signup -> view -> click -> purchase within 3 days:")
    EventAnalytics.funnelSteps(events,
      Seq("signup", "view", "click", "purchase"), windowMinutes = 4320L)
      .orderBy(col("step_idx")).show()

    println("[events] event-type transition matrix (top by probability):")
    EventAnalytics.typeTransitions(events)
      .orderBy(col("prob_ppm").desc, col("from_type"), col("to_type"))
      .show(10)

    println("[events] daily rate spikes vs the trailing week:")
    EventAnalytics.rateAnomaly(events, factorPct = 105)
      .filter(col("is_spike"))
      .orderBy(col("event_type"), col("day")).show(10)

    spark.stop()
  }
}
