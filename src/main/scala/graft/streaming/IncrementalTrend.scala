package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{PageState, RecentChange, TrendConfig}
import graft.operators.PageAggregates

/** Incremental-view-maintenance form of the trend engine: a `foreachBatch`
  * loop that folds each micro-batch into an explicit state table. This is
  * the path that reproduces the reference's CROSS-KEY rename semantics
  * exactly (index.js:154-167) — `flatMapGroupsWithState` cannot move state
  * between keys (SURVEY §7.4 item 1), but a state-table merge can:
  *
  *  per micro-batch:
  *   1. resolve the batch's move log (chain-collapsed, broadcast)
  *   2. re-key EXISTING state through it — overwrite-not-merge: the moved
  *      page replaces any state already at the target id, reproducing
  *      `titles[page.id] = page` (index.js:162-166)
  *   3. canonicalize the batch's edit events and aggregate deltas
  *   4. full-outer merge deltas into state (sums, set unions,
  *      map_zip_with for the per-editor histogram, min/max timestamps)
  *   5. apply deletes (A6) and protects (A5)
  *   6. apply the eviction policy (A7) at the batch's processing time
  *
  * Scale: state and deltas join on `id` (hash exchange); the rename map is
  * broadcast; all merges are column expressions. State stays bounded by
  * eviction, so the per-batch rewrite is proportional to live trending
  * pages — the same working set the reference holds in memory.
  */
object IncrementalTrend {

  import graft.functions.Classifiers.pageId

  /** One micro-batch fold: (previous state, batch events, asOf) → state.
    * `state` and the result use the pageAggregates column layout plus
    * `safe` / `isProtected` flags.
    */
  def processBatch(state: DataFrame, batch: DataFrame,
      asOfMs: Long, cfg: TrendConfig = TrendConfig()): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._

    // 1. Batch rename map (fromId → toId, chains collapsed in ts order).
    val moves = batch
      .filter(col("logType").isNotNull && col("logAction") === "move")
      .select(col("wiki"), col("title"),
        element_at(col("logParams"), "target").as("target"), col("ts"))
      .orderBy(col("ts"))
      .collect()
      .map(r => (pageIdStr(r.getString(0), r.getString(1)),
        pageIdStr(r.getString(0), r.getString(2)), r.getString(2),
        r.getTimestamp(3).getTime))
    PageAggregates.warnIfMoveFlood(moves.length)
    // Sequential-replay chain collapse in O(m) — one reverse-chronological
    // sweep (see PageAggregates.canonicalizeRenames): a from-key's mapping
    // follows its LAST outgoing move, then each arrival node's next move in
    // time; the stored (title, ts) are the FINAL hop's, so simultaneous
    // moves onto one target still resolve latest-wins downstream.
    val fdArrive =
      scala.collection.mutable.HashMap[String, (String, String, Long)]()
    val resolved =
      scala.collection.mutable.HashMap[String, (String, String, Long)]()
    moves.reverseIterator.foreach { case (from, to, toTitle, tsMs) =>
      val dest = fdArrive.getOrElse(to, (to, toTitle, tsMs))
      if (!resolved.contains(from)) resolved(from) = dest
      fdArrive(from) = dest
    }
    val renameMap = resolved.toSeq.map { case (f, (t, tt, ts)) => (f, t, tt, ts) }
      .toDF("r_from", "r_to", "r_to_title", "r_ts")

    // 2. Re-key existing state; moved page overwrites the target's state.
    val rekeyed = state
      .join(broadcast(renameMap), col("id") === col("r_from"), "left")
      .withColumn("moved", col("r_to").isNotNull)
      .withColumn("moveTs", col("r_ts"))
      .withColumn("id", coalesce(col("r_to"), col("id")))
      .withColumn("title", coalesce(col("r_to_title"), col("title")))
      .drop("r_from", "r_to", "r_to_title", "r_ts")
    // Overwrite-not-merge: if a moved row and a resident row share an id,
    // the moved row wins; among multiple moves onto one target, the
    // LATEST move wins (sequential-replay order; reference assigns the
    // moved page over the key, index.js:162-166).
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("moved").desc, col("moveTs").desc_nulls_last)
    val afterRename = rekeyed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "moved", "moveTs")

    // 3. Deletes (A6) — resolved BEFORE the merge so a delete wipes prior
    // state and prior same-batch edits, while later same-batch edits
    // recreate the page (reference drop-then-recreate, index.js:427-430).
    val logEvents = batch.filter(col("logType").isNotNull)
    val deletes = deleteTargets(batch)

    val stateAfterDelete = afterRename.join(broadcast(deletes),
      col("id") === col("del_id"), "left_anti")

    // 4. Canonicalize batch edits, drop those the delete supersedes,
    // aggregate deltas, merge into state (full outer on id).
    val withCanonTitle = batch
      .filter(col("logType").isNull)
      .withColumn("rawId", pageId(col("wiki"), col("title")))
      .join(broadcast(renameMap), col("rawId") === col("r_from"), "left")
      .withColumn("title", coalesce(col("r_to_title"), col("title")))
      .drop("rawId", "r_from", "r_to", "r_to_title", "r_ts")
    val editsSurviving = withCanonTitle
      .withColumn("evId", pageId(col("wiki"), col("title")))
      .join(broadcast(deletes), col("evId") === col("del_id"), "left")
      .filter(col("del_id").isNull || col("ts") > col("del_ts"))
      .drop("evId", "del_id", "del_ts")
    val deltas = PageAggregates.pageAggregates(editsSurviving, cfg)

    val s = stateAfterDelete.as("s"); val d = deltas.as("d")
    val merged = s.join(d, col("s.id") === col("d.id"), "full_outer")
      .select(
        coalesce(col("s.id"), col("d.id")).as("id"),
        coalesce(col("d.title"), col("s.title")).as("title"),
        coalesce(col("s.wiki"), col("d.wiki")).as("wiki"),
        (zeroL(col("s.edits")) + zeroL(col("d.edits"))).as("edits"),
        (zeroL(col("s.anonEdits")) + zeroL(col("d.anonEdits"))).as("anonEdits"),
        (coalesce(col("s.isNew"), lit(false)) ||
          coalesce(col("d.isNew"), lit(false))).as("isNew"),
        (zeroL(col("s.notabilityFlags")) + zeroL(col("d.notabilityFlags")))
          .as("notabilityFlags"),
        (zeroL(col("s.volatileFlags")) + zeroL(col("d.volatileFlags")))
          .as("volatileFlags"),
        (zeroL(col("s.reverts")) + zeroL(col("d.reverts"))).as("reverts"),
        least(col("s.start"), col("d.start")).as("start"),
        greatest(col("s.updated"), col("d.updated")).as("updated"),
        array_sort(array_union(emptyArr(col("s.contributors")),
          emptyArr(col("d.contributors")))).as("contributors"),
        array_sort(array_union(emptyArr(col("s.anons")),
          emptyArr(col("d.anons")))).as("anons"),
        (zeroL(col("s.bytesChanged")) + zeroL(col("d.bytesChanged")))
          .as("bytesChanged"),
        coalesce(col("s.safe"), lit(false)).as("safe"),
        coalesce(col("s.isProtected"), lit(false)).as("isProtected"))

    // 5. Protects (A5: set flag on whatever state exists post-merge).
    val protects = logEvents.filter(col("logAction") === "protect")
      .select(pageId(col("wiki"), col("title")).as("prot_id")).distinct()
    val afterProtect = merged.join(broadcast(protects),
        col("id") === col("prot_id"), "left")
      .withColumn("isProtected", col("isProtected") || col("prot_id").isNotNull)
      .drop("prot_id")

    // 6. Eviction at this batch's processing time.
    PageAggregates.survivors(afterProtect,
      lit(new java.sql.Timestamp(asOfMs)), cfg)
  }

  /** (del_id, del_ts) per deleted page in the batch. Reference takes match
    * group 1 or 2 of the HTML-entity pattern (index.js:330-336) and only
    * drops when log_params is empty.
    */
  private[streaming] def deleteTargets(batch: DataFrame): DataFrame = {
    val delPattern = "&quot;\\[\\[(.*)\\]\\]&quot;|&quot;(.*)&quot;"
    val g1 = regexp_extract(col("logActionComment"), delPattern, 1)
    val g2 = regexp_extract(col("logActionComment"), delPattern, 2)
    batch.filter(col("logType").isNotNull && col("logAction") === "delete")
      // "log_params empty" (ANSI size(null) is null, so test explicitly).
      .filter(col("logParams").isNull || size(col("logParams")) === 0)
      .select(col("wiki"), when(length(g1) > 0, g1).otherwise(g2).as("del_title"),
        col("ts"))
      .filter(length(col("del_title")) > 0)
      .groupBy(pageId(col("wiki"), col("del_title")).as("del_id"))
      .agg(max(col("ts")).as("del_ts"))
  }

  private def zeroL(c: org.apache.spark.sql.Column) = coalesce(c, lit(0L))
  private def emptyArr(c: org.apache.spark.sql.Column) =
    coalesce(c, array().cast("array<string>"))

  private def pageIdStr(wiki: String, title: String): String =
    if (wiki == "enwiki") title else s"$wiki/$title"

  /** Empty state table with the merged-state schema. */
  def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[PageState].toDS().toDF()
      .select(col("id"), col("title"), col("wiki"), col("edits"),
        col("anonEdits"), col("isNew"), col("notabilityFlags"),
        col("volatileFlags"), col("reverts"), col("start"), col("updated"),
        col("contributors"), col("anons"), col("bytesChanged"),
        col("safe"), col("isProtected"))
  }

  /** Fold a finite sequence of micro-batches (testing / replay). */
  def replay(spark: SparkSession, batches: Seq[Seq[RecentChange]],
      asOfMs: Long, cfg: TrendConfig = TrendConfig()): DataFrame = {
    import spark.implicits._
    batches.zipWithIndex.foldLeft(emptyState(spark)) { case (st, (b, i)) =>
      // Materialize each fold so state lineage doesn't grow unboundedly
      // (the streaming run writes state to parquet per batch instead).
      val next = processBatch(st, b.toDF(), asOfMs, cfg)
      next.localCheckpoint(eager = true)
    }
  }

  /** Streaming run: fold micro-batches into a BUCKETED parquet state table —
    * the reference's LevelDB persistence (S2/S3), upgraded from its lossy
    * 20-second snapshot to checkpointed micro-batches.
    *
    * Incremental maintenance: state is partitioned by
    * `bucket = pmod(xxhash64(id), numBuckets)`. Each batch computes the set
    * of buckets its events touch (edit ids, move targets, parsed delete
    * targets), reads ONLY those partitions (partition pruning on the scan),
    * folds the batch into that slice, and rewrites only those bucket dirs
    * via dynamic partition overwrite — per-batch I/O is proportional to
    * touched keys, not total state. The old implementation rewrote the
    * whole table every batch AND swapped it in with a non-atomic
    * delete+rename (a crash window that lost the entire table).
    *
    * Eviction (A7) runs on the touched slice each batch, plus a FULL sweep
    * every `fullSweepEveryNBatches` so idle pages in untouched buckets
    * still age out (the reference cleaner's interval tick).
    *
    * Crash semantics: dynamic partition overwrite stages each bucket dir
    * and commits per partition; a crash mid-write can leave a subset of
    * touched buckets updated. Every bucket write is therefore stamped with
    * its `lastBatchId`, and checkpoint replay skips buckets whose stamp
    * already equals the replayed batch id — re-applying the additive merge
    * to an already-folded bucket (a silent double-count) becomes a no-op
    * without needing a transactional table format. Residual edges, both
    * confined to a crash INSIDE the partition-commit loop: (a) a bucket
    * whose pages ALL evicted leaves no stamp (its dir is deleted) and is
    * simply re-folded — eviction is policy-driven, not additive, so counts
    * stay correct; (b) a rename whose SOURCE bucket committed (row
    * removed) while its TARGET bucket did not loses the migrated row on
    * replay — closing that window needs an atomically-committed table
    * format, which `stateDir` can point at without changing the fold.
    */
  def run(events: Dataset[RecentChange], stateDir: String,
      checkpointDir: String, cfg: TrendConfig = TrendConfig(),
      numBuckets: Int = 64, fullSweepEveryNBatches: Int = 10): StreamingQuery = {
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[RecentChange], batchId: Long) =>
        foldBatch(batch.toDF(), stateDir, batchId,
          System.currentTimeMillis(), cfg, numBuckets, fullSweepEveryNBatches)
      }
      .start()
  }

  private def bucketOf(id: org.apache.spark.sql.Column, n: Int) =
    pmod(xxhash64(id), lit(n.toLong)).cast("int")

  /** Read the live bucketed state table (all buckets, no pruning). */
  def readState(spark: SparkSession, stateDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val live = new Path(stateDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(live) &&
        fs.listStatus(live).exists(_.getPath.getName.startsWith("bucket=")))
      spark.read.parquet(stateDir).drop("bucket", "lastBatchId")
    else emptyState(spark)
  }

  /** One micro-batch fold against the bucketed state table (see `run`). */
  private[graft] def foldBatch(batch0: DataFrame, stateDir: String,
      batchId: Long, asOfMs: Long, cfg: TrendConfig,
      numBuckets: Int, fullSweepEveryNBatches: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch0.sparkSession
    import graft.functions.Classifiers.pageId
    val live = new Path(stateDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stateExists = fs.exists(live) &&
      fs.listStatus(live).exists(_.getPath.getName.startsWith("bucket="))
    val sweep = fullSweepEveryNBatches > 0 && batchId % fullSweepEveryNBatches == 0
    // The batch feeds several jobs (touched-bucket scan, the fold's own
    // collects, the merge) — materialize once.
    val batch = batch0.localCheckpoint(eager = true)

    // Buckets this batch can affect: every event's own page id (covers
    // edits, protects, and each move's SOURCE), move targets, parsed
    // delete targets.
    val evIds = batch.select(pageId(col("wiki"), col("title")).as("id"))
    val moveIds = batch
      .filter(col("logType").isNotNull && col("logAction") === "move")
      .select(pageId(col("wiki"),
        element_at(col("logParams"), "target")).as("id"))
    val delIds = deleteTargets(batch).select(col("del_id").as("id"))
    val touched = evIds.union(moveIds).union(delIds)
      .select(bucketOf(col("id"), numBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet

    val targets = if (sweep && stateExists) (0 until numBuckets).toSet else touched
    // Replay idempotency: buckets whose stamp already carries this batchId
    // were committed by a crashed attempt of the SAME batch — folding the
    // additive merge into them again would double-count. Skip them; fold
    // only the pending slice.
    val (applied, prev) =
      if (!stateExists) (Set.empty[Int], emptyState(spark))
      else {
        val raw = spark.read.parquet(stateDir)
        // Schema migration: a state dir written before the lastBatchId
        // stamp existed has no such column. Streaming batchIds are >= 0,
        // so -1 reads as "no bucket has applied any batch yet" — the whole
        // table is a pending fold target, which is the correct (at-least-
        // once, additive-merge-safe) resume for pre-stamp state.
        val scoped0 =
          if (raw.columns.contains("lastBatchId")) raw
          else raw.withColumn("lastBatchId", lit(-1L))
        val scoped =
          if (sweep) scoped0
          else scoped0.filter(col("bucket")
            .isin(touched.toSeq.map(Integer.valueOf): _*))
        val done = scoped.groupBy(col("bucket"))
          .agg(max(col("lastBatchId")).as("lb"))
          .filter(col("lb") === batchId)
          .collect().map(_.getInt(0)).toSet
        val pendingPrev = scoped
          .filter(!col("bucket").isin(done.toSeq.map(Integer.valueOf): _*))
          .drop("bucket", "lastBatchId")
        (done, pendingPrev)
      }
    val pending = targets -- applied
    if (pending.isEmpty) return

    // Materialize the fold BEFORE overwriting the dirs it was read from.
    // Rows landing in an already-applied bucket (a move whose target bucket
    // committed before the crash) are filtered out — their state is there.
    val next = processBatch(prev, batch, asOfMs, cfg)
      .withColumn("bucket", bucketOf(col("id"), numBuckets))
      .filter(col("bucket").isin(pending.toSeq.map(Integer.valueOf): _*))
      .withColumn("lastBatchId", lit(batchId))
      .localCheckpoint(eager = true)

    if (!next.isEmpty) {
      next.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(stateDir)
    }
    // A touched bucket whose pages ALL evicted/deleted writes no rows, so
    // dynamic overwrite leaves its old files — drop those dirs explicitly.
    val written = next.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    (pending -- written).foreach { b =>
      val dir = new Path(live, s"bucket=$b")
      if (fs.exists(dir)) fs.delete(dir, true)
    }
  }
}
