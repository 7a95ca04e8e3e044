package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization barrier for iterative and multi-read plans — the single
  * switch point for the fault-tolerance trade documented in SURVEY.md §8
  * ("checkpoint fault-tolerance fence").
  *
  * Default (`spark.graft.reliableCheckpoints` unset/false):
  * `localCheckpoint(eager = true)` — blocks live unreplicated on executors.
  * Fastest, and correct on the driver's single-JVM verification environment
  * and on-demand clusters, but a lost executor aborts the job with no
  * recompute path (Spark documents this tradeoff).
  *
  * `spark.graft.reliableCheckpoints=true`: reliable `checkpoint(eager =
  * true)` against `sparkContext.setCheckpointDir` on shared storage — the
  * right setting for preemptible/spot capacity, at the cost of a write+read
  * of each barrier through the checkpoint filesystem. Fails fast with
  * guidance if the directory was never set (Spark's own error only appears
  * deep in a job).
  *
  * Every iterative operator (Lloyd's loops, pointer-jumping CC, BPE rounds,
  * fingerprint/gram tables read by self-joins, multi-branch audit heads)
  * routes its barrier through here, so the swap is one config key — no call
  * site changes.
  */
private[graft] object Barrier {

  /** Config key: route barriers through reliable `checkpoint()`. */
  val ReliableKey = "spark.graft.reliableCheckpoints"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.get(ReliableKey, "false").toBoolean
    if (reliable) {
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        throw new IllegalStateException(
          s"$ReliableKey=true but no checkpoint directory is set; call " +
            "sparkContext.setCheckpointDir(<shared storage path>) first")
      // Persist first: an unpersisted reliable checkpoint computes its
      // subtree TWICE (once for the eager materialization, once for the
      // ReliableCheckpointRDD write job) — localCheckpoint avoids that by
      // caching blocks on the first pass, so reliable mode must too.
      // Checkpoint-file cleanup across loop rounds: enable
      // spark.cleaner.referenceTracking.cleanCheckpoints=true in the
      // deployment, or sweep the checkpoint dir between jobs.
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint(eager = true)
      finally cached.unpersist(blocking = false)
    } else df.localCheckpoint(eager = true)
  }

  /** Persist `df` for the duration of `body`, unpersisting on every exit
    * path. The bare persist→work→unpersist span leaks the cache when the
    * body throws — and the Verify driver catches per-query failures and
    * CONTINUES, so a long session accumulates corpus-sized orphan caches.
    */
  def withCached[T](df: DataFrame)(body: DataFrame => T): T = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try body(cached)
    finally cached.unpersist(blocking = false)
  }

  /** Best-effort release of a SUPERSEDED barrier's materialized blocks.
    * Iterative loops re-barrier every round (Lloyd's, BPE merges) and the
    * previous generation's checkpoint blocks otherwise live until a
    * nondeterministic driver GC lets ContextCleaner reclaim them — up to
    * k× the table size in executor storage across a k-round loop.
    *
    * ONLY call this on a DataFrame that will never be read again: a
    * local checkpoint's blocks ARE its data (there is no recompute
    * path), so releasing a barrier that is still referenced fails the
    * next job over it.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** `df.barrier()` — chain-friendly form of [[Barrier.apply]]. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(): DataFrame = Barrier(df)
  }
}
