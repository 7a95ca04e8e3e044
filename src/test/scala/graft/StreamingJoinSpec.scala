package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join (§2.2 streaming): two watermarked streams
  * joined on key + time range — the streaming twin of
  * `RangeJoin.slidingCount`'s batch shape. Watermarks bound BOTH sides'
  * join state: a buffered right row can be dropped once the left
  * watermark passes its latest possible match (`ts + window`), which is
  * what keeps the operator's state finite on an unbounded feed.
  */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def at(min: Int) = new Timestamp(t0 + min * 60000L)

  test("watermarked interval join equals the batch interval join") {
    val purchases = Seq(
      ("u1", at(90)), ("u1", at(200)), ("u2", at(30)))
    val views = Seq(
      ("u1", at(40)),  // 50 min before p1: IN
      ("u1", at(89)),  // 1 min before p1: IN
      ("u1", at(90)),  // equal ts: OUT (half-open)
      ("u1", at(199)), // 1 min before p2: IN
      ("u2", at(100))) // after u2's purchase: OUT
    val ps = MemoryStream[(String, Timestamp)](spark)
    val vs = MemoryStream[(String, Timestamp)](spark)
    ps.addData(purchases)
    vs.addData(views)
    val p = ps.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "2 hours")
    val v = vs.toDF().toDF("v_user", "v_ts").withWatermark("v_ts", "2 hours")
    val joined = p.join(v,
      expr("""v_user = p_user AND
              v_ts >= p_ts - interval 1 hour AND v_ts < p_ts"""))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("ssjoin")
      .select(col("p_user"), col("p_ts"), col("v_ts"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    val expected = Set(
      ("u1", at(90), at(40)),
      ("u1", at(90), at(89)),
      ("u1", at(200), at(199)))
    assert(streamed == expected)
    // Same predicate in batch gives the same pairs (stream ≡ batch).
    val batch = purchases.toDF("p_user", "p_ts")
      .join(views.toDF("v_user", "v_ts"),
        expr("""v_user = p_user AND
                v_ts >= p_ts - interval 1 hour AND v_ts < p_ts"""))
      .select(col("p_user"), col("p_ts"), col("v_ts"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    assert(streamed == batch)
  }
}
