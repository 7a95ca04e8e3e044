package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: the two standard salting recipes for keys
  * whose row counts are orders of magnitude above the median (the "hot
  * key" problem that stalls one reducer while 999 idle on a large
  * cluster). Both are pure plan rewrites — results are identical to the
  * unsalted operator, which is what makes them oracle-checkable.
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
  def saltedCounts(df: DataFrame, key: Column, weight: Column,
      salt: Int = 16): DataFrame = {
    val salted = df.select(key.as("key"), weight.as("w"),
      pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)),
        lit(salt.toLong)).as("salt"))
    salted.groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("w")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("total"))
  }

  /** Salted broadcast-free equi-join for a skewed probe side: the small
    * (dimension) side is replicated `salt`× with an explicit salt column,
    * the big side tags each row with a deterministic salt, and the join
    * key becomes `(key, salt)` — a hot key's rows now land on `salt`
    * different reducers instead of one. Use when the dimension is too big
    * to broadcast but small enough to replicate `salt`×.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)),
        lit(salt.toLong)))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
