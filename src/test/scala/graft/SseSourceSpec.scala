package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.RecentChange
import graft.sources.EventAdapter

/** DSv2 `graft-sse` source spec: raw JSONL replay (batch + micro-batch),
  * wire-schema decode, and the full trend pipeline over the decoded feed —
  * S1 end-to-end (SURVEY §2.1).
  */
class SseSourceSpec extends SparkSpec {
  import spark.implicits._

  private val wireEvents = Seq(
    """{"title":"Foo","comment":"yo","namespace":0,"user":"Jon","bot":false,"type":"edit","length":{"old":1,"new":2},"wiki":"enwiki","server_name":"en.wikipedia.org","meta":{"dt":"2024-01-01T00:00:00Z"}}""",
    """{"title":"Foo","comment":"reverted","namespace":0,"user":"Rev","bot":false,"type":"edit","length":{"old":2,"new":1},"wiki":"enwiki","server_name":"en.wikipedia.org","meta":{"dt":"2024-01-01T00:01:00Z"}}""",
    """{"title":"Bar","comment":"current event","namespace":0,"user":"Ann","bot":false,"type":"new","length":{"old":0,"new":9},"wiki":"enwiki","server_name":"en.wikipedia.org","meta":{"dt":"2024-01-01T00:02:00Z"}}""",
    """{"title":"Talk","comment":"x","namespace":1,"user":"Jon","bot":false,"type":"edit","length":{"old":0,"new":1},"wiki":"enwiki","server_name":"en.wikipedia.org","meta":{"dt":"2024-01-01T00:03:00Z"}}""")

  private def writeFeed(): String = {
    val f = Files.createTempFile("sse-feed", ".jsonl")
    Files.writeString(f, wireEvents.mkString("\n") + "\n")
    f.toString
  }

  test("batch read: one row per message with line offsets") {
    val path = writeFeed()
    val rows = spark.read.format("graft-sse").option("path", path).load()
      .orderBy("offset").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("offset")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows(0).getAs[String]("value").contains("\"title\":\"Foo\""))
  }

  test("wire decode + trend aggregation over the replayed feed") {
    val path = writeFeed()
    val raw = spark.read.format("graft-sse").option("path", path).load()
    val pages = graft.operators.PageAggregates
      .pageAggregates(EventAdapter.decodeWire(raw))
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    // Talk-namespace event filtered (F1); Foo: 1 edit + 1 revert; Bar: new.
    assert(pages.keySet == Set("Foo", "Bar"))
    assert(pages("Foo").getAs[Long]("edits") == 1L)
    assert(pages("Foo").getAs[Long]("reverts") == 1L)
    assert(pages("Bar").getAs[Boolean]("isNew"))
    assert(pages("Bar").getAs[Long]("notabilityFlags") == 1L)
  }

  test("micro-batch stream: AvailableNow drains the log through the source") {
    val path = writeFeed()
    val q = spark.readStream.format("graft-sse").option("path", path).load()
      .writeStream.format("memory").queryName("sse_raw")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.table("sse_raw").count() == 4)
  }
}
