package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.api.TrendCollection
import graft.model.{RecentChange, TrendConfig}

/** API facade spec: the reference surface (getPages/getPage/drop/markSafe/
  * top-k boards) over a batch events view (reference behaviors at
  * index.js:409-456, examples/index.js:20-48).
  */
class TrendCollectionSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def ev(title: String, user: String = "Jon", n: Int = 1,
      deltaEach: Long = 1L): Seq[RecentChange] =
    (0 until n).map(i => RecentChange(title, "yo", 0, user, bot = false, "edit",
      0L, deltaEach, "enwiki", "en.wikipedia.org", null, null, null, null,
      new Timestamp(t0.getTime + i * 1000L)))

  // Relaxed eviction so test fixtures survive the policy.
  private val cfg = TrendConfig(minSpeed = 0.0, maxInactivityMins = 1000000,
    maxLifespanMins = 1000000)

  private def collection(events: Seq[RecentChange]) =
    TrendCollection(spark, events.toDF(), cfg)
      .withAsOf(Timestamp.valueOf("2024-01-01 00:10:00"))

  test("getPages + getPage + drop (tests.js:38-61)") {
    val c = collection(ev("Foo") ++ ev("Bar", n = 3))
    assert(c.getPages().count() == 2)
    val foo = c.getPage("Foo", "enwiki")
    assert(foo.isDefined && foo.get.getAs[Long]("edits") == 1L)
    c.drop("Foo", "enwiki")
    assert(c.getPages().count() == 1)
    assert(c.getPage("Foo", "enwiki").isEmpty)
  }

  test("markSafe exempts a page from policy eviction") {
    val strict = TrendConfig(minSpeed = 1000.0) // everything too slow
    val c = TrendCollection(spark, (ev("Foo") ++ ev("Bar")).toDF(), strict)
      .withAsOf(Timestamp.valueOf("2024-01-01 00:10:00"))
    assert(c.getPages().count() == 0)     // all evicted
    c.markSafe("Foo")
    assert(c.getPages().select("id").as[String].collect().toSeq == Seq("Foo"))
    c.markSafe("Foo", unsafe = true)
    assert(c.getPages().count() == 0)
  }

  test("top-k boards order by metric desc") {
    val c = collection(ev("Hot", n = 8) ++ ev("Warm", n = 3) ++ ev("Cold"))
    val byEpm = c.topByEditsPerMinute(2).select("id").as[String].collect()
    assert(byEpm.toSeq == Seq("Hot", "Warm"))
    val byBytes = c.topByBytesChanged(1).select("id").as[String].collect()
    assert(byBytes.toSeq == Seq("Hot"))
  }

  test("bias board: single-author page ranks above multi-author page") {
    val solo = ev("Solo", user = "OnlyMe", n = 4)
    val multi = ev("Multi", user = "A", n = 2) ++
      (0 until 2).map(i => RecentChange("Multi", "yo", 0, s"B$i", bot = false,
        "edit", 0L, 1L, "enwiki", "en.wikipedia.org", null, null, null, null,
        new Timestamp(t0.getTime + (100 + i) * 1000L)))
    val c = collection(solo ++ multi)
    val top = c.topByBias(2).collect()
    assert(top(0).getAs[String]("id") == "Solo")
    assert(top(0).getAs[Double]("bias") == 1.0)
    assert(top(1).getAs[Double]("bias") == 0.5)
  }

  test("protectPage sets isProtected in the batch view (index.js:417-422)") {
    val c = collection(ev("Foo") ++ ev("Bar"))
    assert(c.getPages().filter(col("isProtected")).count() == 0)
    c.protectPage("Foo", "enwiki")
    val prot = c.getPages().filter(col("isProtected"))
      .select("id").as[String].collect()
    assert(prot.toSeq == Seq("Foo"))
    // The flag marks, never filters: both pages stay live.
    assert(c.getPages().count() == 2)
  }

  test("stateSnapshot: Q1 over the streaming query's state store") {
    import java.nio.file.Files
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RecentChange](spark)
    ms.addData(ev("Foo", n = 2) ++ ev("Bar"))
    // onEdit must CONSUME the batch — an unconsumed foreachBatch dataset
    // never runs the stateful tasks, so the state stores never commit
    // (Spark validates this per batch).
    // Finite replay: evict=false + AvailableNow — with cleaner timers
    // armed the engine would service them forever and never drain.
    val q = TrendCollection.streaming(ms.toDS(), ckpt, cfg, evict = false,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()) {
      (b, _) => b.count(); ()
    }
    try assert(q.awaitTermination(120000)) finally q.stop()
    // The state data source reads the last committed batch's store — the
    // streaming getPages (reference index.js:453-456 over `titles`).
    val snap = TrendCollection.stateSnapshot(spark, ckpt)
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(snap.keySet == Set("Foo", "Bar"))
    assert(snap("Foo").getAs[Long]("edits") == 2L)
    assert(snap("Bar").getAs[Long]("edits") == 1L)
    // clearCache (index.js:131-139): next run starts cold.
    TrendCollection.clearCache(spark, ckpt)
    assert(!new java.io.File(ckpt).exists())
  }
}
