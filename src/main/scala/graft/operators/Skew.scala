package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: the two standard salting recipes for keys
  * whose row counts are orders of magnitude above the median (the "hot
  * key" problem that stalls one reducer while 999 idle on a large
  * cluster). Both are pure plan rewrites — ROW SETS are identical to the
  * unsalted operator, which is what makes them oracle-checkable. For
  * floating-point SUMS that identity is set-wise, not bit-wise: the
  * two-phase fold adds partials in a different order, so hash-exact
  * pipelines should feed integer/decimal weights (the registered
  * `q12_salted_agg` uses BIGINT) or grid-round per the driver contract.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * cover the cases it doesn't: single hot GROUP BY keys, and broadcast-
  * size dimension joins where the probe side is skewed.
  */
object Skew {

  /** Two-phase (salted) aggregation: partially aggregate on
    * `(key, salt)` — spreading each hot key over `salt` reducers — then
    * combine the partials per key. Any aggregate that decomposes into
    * (partial, combine) pairs fits; this helper takes the common
    * count/sum shape. The salt is a deterministic row hash, so re-runs
    * partition identically (no rand(): nondeterministic salts break
    * retried-task idempotency — a failed-and-retried stage could
    * double-count).
    *
    * Phase 1 runs map-side combine exactly like a plain groupBy, so the
    * extra cost is ONE narrow second aggregation over `keys × salt` rows.
    */
  /** The ONE scratch/output-name collision guard (the AsOf
    * payload-collision rule): withColumn would silently OVERWRITE a
    * caller's same-named column and the rewrite would emit derived
    * values under the user's name. Shared by the salting rewrites and
    * the bucketed range join — three hand-copied requires had already
    * drifted (the range join's copy missed its OUTPUT names).
    */
  private[graft] def requireScratchFree(df: DataFrame, names: Seq[String],
      rewrite: String): Unit =
    names.foreach(c =>
      require(!df.columns.contains(c),
        s"input already carries a '$c' column — rename it; the " +
          s"$rewrite uses that name"))

  /** The shared salt column over a row-id-extended frame: hash of the
    * UNIQUE partition-local row id alone. Hashing the row's content too
    * (the previous form) bought nothing — `__rid` already distinguishes
    * the identical-rows hot key the content hash collapses onto one
    * salt — and cost an xxhash64 over every column (wide text payloads
    * included) per big-side row. Any final result is salt-independent,
    * so the layout dependence of the id costs nothing.
    *
    * RETRY CONTRACT: a retried task re-derives its partition's ids only
    * when the input's per-partition row ORDER is deterministic — true
    * for file scans and barriered/checkpointed frames, NOT for the
    * direct output of a shuffle (fetch order varies across attempts, so
    * a recomputed map task could re-salt rows differently while some
    * reducers already consumed the first attempt). Salt a scan or a
    * barrier, not a bare exchange output; a localCheckpoint upstream
    * also suffices (lost blocks abort the job — no silent recompute
    * path exists to diverge).
    */
  private def withSalt(df: DataFrame, salt: Int): DataFrame = {
    require(salt > 0, s"salt=$salt must be positive — salt <= 0 would " +
      "silently degenerate (empty replication / NULL salt), not error")
    requireScratchFree(df, Seq("__rid", "__salt"),
      "salting rewrite (scratch)")
    df.withColumn("__rid", monotonically_increasing_id())
      .withColumn("__salt", pmod(xxhash64(col("__rid")), lit(salt.toLong)))
      .drop("__rid")
  }

  def saltedCounts(df: DataFrame, key: Column, weight: Column,
      salt: Int = 16): DataFrame = {
    val salted = withSalt(df, salt)
      .select(key.as("key"), weight.as("w"), col("__salt").as("salt"))
    salted.groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("w")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("total"))
  }

  /** Salted broadcast-free equi-join for a skewed probe side: the small
    * (dimension) side is replicated `salt`× with an explicit salt column,
    * the big side tags each row with a salt, and the join key becomes
    * `(key, salt)` — a hot key's rows now land on `salt` different
    * reducers instead of one. Use when the dimension is too big to
    * broadcast but small enough to replicate `salt`×.
    *
    * The salt hashes a per-row id ([[withSalt]] — a content hash would
    * collapse a hot key of IDENTICAL rows onto ONE salt and defeat the
    * spreading). The join RESULT is salt-independent (the dim side
    * carries every salt value), so the partition-layout-dependence of
    * the id costs nothing. Retry idempotency follows withSalt's
    * contract: salt a scan or a barriered frame, not a bare shuffle
    * output (see [[withSalt]]).
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    requireScratchFree(dim, Seq("__salt"), "salting rewrite (scratch)")
    val saltedBig = withSalt(big, salt)
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
