package graft

import java.sql.Timestamp

import graft.model.{RecentChange, TrendConfig}
import graft.streaming.IncrementalTrend

/** Incremental state-table spec: cross-key rename carried ACROSS
  * micro-batches (the semantics flatMapGroupsWithState can't express),
  * overwrite-not-merge at the rename target, log-comment deletes, protect,
  * eviction — the reference behaviors at index.js:154-167, 324-337.
  */
class IncrementalTrendSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
  private val asOf = at(10).getTime

  // Relaxed eviction so fixtures survive.
  private val cfg = TrendConfig(minSpeed = 0.0, maxInactivityMins = 1000000,
    maxLifespanMins = 1000000)

  private def edit(title: String, user: String = "Jon", min: Int = 0,
      comment: String = "yo", wiki: String = "enwiki"): RecentChange =
    RecentChange(title, comment, 0, user, bot = false, "edit", 1L, 2L, wiki,
      "en.wikipedia.org", null, null, null, null, at(min))

  private def move(from: String, to: String, min: Int,
      wiki: String = "enwiki"): RecentChange =
    RecentChange(from, "moved", 0, "Admin", bot = false, "log", 0L, 0L, wiki,
      "en.wikipedia.org", "log", "move", Map("target" -> to), null, at(min))

  private def del(comment: String, min: Int): RecentChange =
    RecentChange("x", "deleted", 0, "Admin", bot = false, "log", 0L, 0L,
      "enwiki", "en.wikipedia.org", "log", "delete", null, comment, at(min))

  private def protect(title: String, min: Int): RecentChange =
    RecentChange(title, "protected", 0, "Admin", bot = false, "log", 0L, 0L,
      "enwiki", "en.wikipedia.org", "log", "protect", null, null, at(min))

  private def replay(batches: Seq[RecentChange]*) =
    IncrementalTrend.replay(spark, batches, asOf, cfg)
      .collect().map(r => r.getAs[String]("id") -> r).toMap

  test("reference move fixture: rename leaves exactly one page (tests.js:63-78)") {
    val st = replay(Seq(edit("Foo", min = 0), move("Foo", "FoO", 1)))
    assert(st.keySet == Set("FoO"))
    assert(st("FoO").getAs[Long]("edits") == 1L)
    assert(st("FoO").getAs[String]("title") == "FoO")
  }

  test("cross-batch rename migrates accumulated state to the new key") {
    val st = replay(
      Seq(edit("Foo", min = 0), edit("Foo", user = "Ann", min = 1)),
      Seq(move("Foo", "Bar", 2)),
      Seq(edit("Bar", user = "Eve", min = 3)))
    assert(st.keySet == Set("Bar"))
    val p = st("Bar")
    assert(p.getAs[Long]("edits") == 3L) // 2 carried + 1 post-rename
    assert(p.getSeq[String](p.fieldIndex("contributors")).toSet ==
      Set("Jon", "Ann", "Eve"))
  }

  test("rename overwrites existing state at the target (index.js:162-166)") {
    val st = replay(
      Seq(edit("Old", min = 0), edit("Old", min = 1),
        edit("Target", user = "T", min = 0)),
      Seq(move("Old", "Target", 2)))
    assert(st.keySet == Set("Target"))
    // Old's 2 edits replace Target's 1 (overwrite, not merge).
    assert(st("Target").getAs[Long]("edits") == 2L)
  }

  test("delete via log_action_comment drops state across batches (A6)") {
    val st = replay(
      Seq(edit("Doomed", min = 0), edit("Kept", min = 0)),
      Seq(del("deleted &quot;[[Doomed]]&quot; for reasons", 1)))
    assert(st.keySet == Set("Kept"))
  }

  test("protect sets the flag on existing state (A5)") {
    val st = replay(
      Seq(edit("Page", min = 0)),
      Seq(protect("Page", 1)))
    assert(st("Page").getAs[Boolean]("isProtected"))
  }

  test("eviction applies per batch at processing time (A7)") {
    val strict = TrendConfig(minSpeed = 1000.0, minPurgeTimeMins = 1)
    val st = IncrementalTrend.replay(spark,
      Seq(Seq(edit("Slow", min = 0))), asOf, strict).collect()
    assert(st.isEmpty) // too slow, past grace period
  }

  test("vacated-title reuse: C moved onto A's old title stays at A, not A's destination") {
    // A→B at t2, then C→A at t4: C's history must land on A (the vacated
    // title), NOT follow A's earlier mapping to B.
    val st = replay(Seq(
      edit("A", user = "ua", min = 0),
      edit("C", user = "uc", min = 1),
      move("A", "B", 2),
      edit("B", user = "ub", min = 3),
      move("C", "A", 4)))
    assert(st.keySet == Set("A", "B"))
    assert(st("A").getAs[Long]("edits") == 1L)  // C's history now at A
    val a = st("A")
    assert(a.getSeq[String](a.fieldIndex("contributors")) == Seq("uc"))
    assert(st("B").getAs[Long]("edits") == 2L)  // A's + post-move edits
  }

  test("delete then same-batch recreate keeps only post-delete edits (A6)") {
    val st = replay(Seq(
      edit("Phoenix", user = "Old", min = 0),
      del("deleted &quot;[[Phoenix]]&quot; spam", 1),
      edit("Phoenix", user = "New", min = 2)))
    val p = st("Phoenix")
    assert(p.getAs[Long]("edits") == 1L)
    assert(p.getSeq[String](p.fieldIndex("contributors")) == Seq("New"))
  }

  test("two same-batch moves onto one target: the later move wins deterministically") {
    val st = replay(
      Seq(edit("A", user = "ua", min = 0), edit("A", user = "ua2", min = 1),
        edit("B", user = "ub", min = 0)),
      Seq(move("A", "C", 2), move("B", "C", 3)))
    assert(st.keySet == Set("C"))
    // B's move is later; B's state overwrites A's at C.
    val c = st("C")
    assert(c.getAs[Long]("edits") == 1L)
    assert(c.getSeq[String](c.fieldIndex("contributors")) == Seq("ub"))
  }

  test("incremental fold equals one-shot batch aggregation (no log events)") {
    val events = (0 until 30).map(i =>
      edit(s"P${i % 3}", user = s"u${i % 5}", min = i))
    val incremental = replay(events.grouped(7).toSeq: _*)
    val oneShot = {
      import spark.implicits._
      graft.operators.PageAggregates.pageAggregates(events.toDF(), cfg)
        .collect().map(r => r.getAs[String]("id") -> r).toMap
    }
    assert(incremental.keySet == oneShot.keySet)
    incremental.foreach { case (id, r) =>
      val o = oneShot(id)
      assert(r.getAs[Long]("edits") == o.getAs[Long]("edits"), s"edits@$id")
      assert(r.getAs[Long]("bytesChanged") == o.getAs[Long]("bytesChanged"))
      assert(r.getAs[Timestamp]("start") == o.getAs[Timestamp]("start"))
      assert(r.getAs[Timestamp]("updated") == o.getAs[Timestamp]("updated"))
      assert(r.getSeq[String](r.fieldIndex("contributors")).toSet ==
        o.getSeq[String](o.fieldIndex("contributors")).toSet)
    }
  }

  // --- bucketed incremental state table (S2/S3) ---------------------------

  private def foldToDir(dir: String, batchId: Long, events: Seq[RecentChange],
      buckets: Int = 8, sweepEvery: Int = 0): Unit = {
    import spark.implicits._
    IncrementalTrend.foldBatch(events.toDF(), dir, batchId, asOf, cfg,
      buckets, sweepEvery)
  }

  test("bucketed state: multi-batch fold equals one-shot aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    val b1 = Seq(edit("Foo", min = 0), edit("Bar", user = "Ann", min = 0))
    val b2 = Seq(edit("Foo", user = "Eve", min = 1), edit("Baz", min = 1))
    foldToDir(dir, 0, b1); foldToDir(dir, 1, b2)
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st.keySet == Set("Foo", "Bar", "Baz"))
    assert(st("Foo").getAs[Long]("edits") == 2L)
    val foo = st("Foo")
    assert(foo.getSeq[String](foo.fieldIndex("contributors")).toSet ==
      Set("Jon", "Eve"))
  }

  test("bucketed state: per-batch write touches only the batch's buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Foo", min = 0), edit("Bar", min = 0),
      edit("Baz", min = 0), edit("Qux", min = 0)))
    val root = new java.io.File(dir)
    val before = root.listFiles().filter(_.getName.startsWith("bucket="))
      .map(d => d.getName -> d.listFiles().map(f =>
        f.getName -> f.lastModified()).toMap).toMap
    Thread.sleep(1100) // mtime granularity
    // Second batch touches ONLY Foo's bucket.
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    val after = root.listFiles().filter(_.getName.startsWith("bucket="))
      .map(d => d.getName -> d.listFiles().map(f =>
        f.getName -> f.lastModified()).toMap).toMap
    // Every bucket dir present before and not containing Foo must be
    // byte-identical (same files, same mtimes) — proportional-write proof.
    val changed = before.keys.filter(k =>
      after.get(k).forall(_ != before(k))).toSet
    assert(changed.size <= 1, s"expected at most Foo's bucket to change, got $changed")
    // And the fold itself stayed correct.
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st("Foo").getAs[Long]("edits") == 2L && st.size == 4)
  }

  test("bucketed state: replaying a committed batch is a no-op (idempotent)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Foo", min = 0)))
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    // Checkpoint replay after a crash re-invokes foldBatch with the same
    // batchId; the bucket's lastBatchId stamp must make it a no-op instead
    // of double-counting the additive merge.
    foldToDir(dir, 1, Seq(edit("Foo", user = "Eve", min = 1)))
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st("Foo").getAs[Long]("edits") == 2L)
    assert(st("Foo").getSeq[String](st("Foo").fieldIndex("contributors")).toSet ==
      Set("Jon", "Eve"))
  }

  test("bucketed state: pre-stamp state dir (no lastBatchId column) still folds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Foo", min = 0)), buckets = 1)
    // Simulate a state dir written before the lastBatchId stamp existed:
    // rewrite the table without the column (schema migration path).
    val stripped = spark.read.parquet(dir).drop("lastBatchId")
      .localCheckpoint(eager = true)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    stripped.write.partitionBy("bucket").parquet(dir)
    foldToDir(dir, 5, Seq(edit("Foo", user = "Eve", min = 1)), buckets = 1)
    val st = IncrementalTrend.readState(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(st("Foo").getAs[Long]("edits") == 2L)
  }

  test("bucketed state: delete empties its bucket dir when last page goes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    foldToDir(dir, 0, Seq(edit("Doomed", min = 0)), buckets = 1)
    assert(IncrementalTrend.readState(spark, dir).count() == 1)
    foldToDir(dir, 1, Seq(del("deleted &quot;[[Doomed]]&quot; gone", 1)), buckets = 1)
    assert(IncrementalTrend.readState(spark, dir).count() == 0)
  }

  test("bucketed state: full sweep evicts idle pages in untouched buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/st"
    // Tight eviction: everything idles out immediately past the grace period.
    val evict = TrendConfig(minSpeed = 1000.0, maxInactivityMins = 1,
      maxLifespanMins = 1, minPurgeTimeMins = 1)
    import spark.implicits._
    IncrementalTrend.foldBatch(Seq(edit("Old", min = 0)).toDF(), dir, 1,
      at(0).getTime + 30000, evict, 4, 10) // batchId 1: no sweep, within grace
    assert(IncrementalTrend.readState(spark, dir).count() == 1)
    // Batch 10 (sweep) carries NO events for Old's bucket, but the sweep
    // applies the eviction policy to the whole table at asOf = +10 min.
    IncrementalTrend.foldBatch(Seq.empty[RecentChange].toDF(), dir, 10,
      asOf, evict, 4, 10)
    assert(IncrementalTrend.readState(spark, dir).count() == 0)
  }
}
