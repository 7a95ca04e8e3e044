package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: for each left row, aggregate the right rows of
  * the same key whose timestamp falls in the half-open window
  * `[leftTs − window, leftTs)` — "views in the hour before each purchase",
  * "errors in the 5 minutes before each crash". The naive encoding is a
  * non-equi theta join (`l.key = r.key AND r.ts BETWEEN ...`), which Spark
  * executes per key-group as a nested loop — quadratic in events-per-key
  * and a scale killer on hot keys.
  *
  * This is the standard bucketed shape instead: quantize both sides to
  * `window`-wide time buckets, replicate each RIGHT row into its own
  * bucket and the next one (a left row's window spans at most those two),
  * equi-join on (key, bucket) — hash join, shuffle bounded by data size ×
  * 2 — and verify the exact interval predicate map-side before the
  * aggregation. Each right row can match a given left row through exactly
  * one of its two copies (the left row has one bucket), so no dedup pass
  * is needed and counts are exact.
  */
object RangeJoin {

  /** One row per left row: all `left` columns plus `hits` = the number of
    * right rows with the same `key` and `rightTs` in
    * `[leftTs − windowMicros, leftTs)`. Timestamps compare in exact
    * microseconds (`unix_micros`), so the window edges are engine-exact.
    *
    * Precondition: `left` rows are distinct (e.g. carry an event id) —
    * the hit counts re-attach by joining on the full left row. The
    * re-attach join is NULL-SAFE (`<=>`): SQL GROUP BY already treats
    * nulls as equal, so a left row carrying a null in any column still
    * matches its own aggregated hit row instead of silently reporting 0
    * (a plain equality join would never match it).
    */
  def slidingCount(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowMicros: Long): DataFrame =
    slidingAgg(left, right, key, leftTs, rightTs, windowMicros,
      valueCol = None)

  /** [[slidingCount]] plus a summed measure: `hits` and `win_sum` =
    * sum of the right side's `valueCol` over the same half-open window.
    * Same bucketed hash-equi-join shape; rows with an empty window get
    * hits = 0, win_sum = 0.0. Callers should grid-round `win_sum` when
    * hash-comparing across engines (double sums are fold-order-dependent;
    * fixed-decimal inputs make the rounded sum exact — see q1_agg).
    * A null `valueCol` on a matched right row is skipped by the sum but
    * still counted in `hits` (standard SQL aggregate semantics).
    */
  def slidingSum(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowMicros: Long,
      valueCol: String): DataFrame =
    slidingAgg(left, right, key, leftTs, rightTs, windowMicros,
      Some(valueCol))

  /** The shared bucket/replicate/join/re-attach core — the self-join
    * disambiguation (fresh `__g_` attributes) and null-safe (`<=>`)
    * re-attach invariants live in exactly one place; the sum variant
    * only adds the value column and its aggregate.
    */
  private def slidingAgg(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowMicros: Long,
      valueCol: Option[String]): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    val l = left.withColumn("__ltsu", unix_micros(col(leftTs)))
      .withColumn("__bkt", floor(col("__ltsu") / windowMicros))
    val rBase = right.select(
      col(key).as("__rk") +: unix_micros(col(rightTs)).as("__rtsu") +:
        valueCol.map(v => col(v).as("__rv")).toSeq: _*)
      .withColumn("__rbkt0", floor(col("__rtsu") / windowMicros))
    val r = rBase.select(
      col("__rk") +: col("__rtsu") +:
        (valueCol.map(_ => col("__rv")).toSeq :+
          explode(array(col("__rbkt0"), col("__rbkt0") + 1)).as("__bkt")): _*)
    // Group keys re-aliased (fresh attributes): the hit table derives from
    // `left`, so joining back on the raw columns would be self-join
    // ambiguous ("trivially true" condition).
    val aggs = count(lit(1)).as("hits") +:
      valueCol.map(_ => sum(col("__rv")).as("win_sum")).toSeq
    val hits = l
      .join(r,
        l(key) === r("__rk") && l("__bkt") === r("__bkt") &&
          r("__rtsu") >= l("__ltsu") - windowMicros &&
          r("__rtsu") < l("__ltsu"))
      .groupBy(left.columns.toIndexedSeq.map(c => l(c).as(s"__g_$c")): _*)
      .agg(aggs.head, aggs.tail: _*)
    // Left rows with an empty window drop out of the inner join — union
    // them back with hits = 0 via an anti-join-free left join on the
    // original columns (cheap: the hit table is one row per matched left
    // row, already aggregated). Null-safe equality per column so nulls
    // re-attach; grouping already merged them, matching <=> semantics.
    val cond = left.columns.toIndexedSeq
      .map(c => left(c) <=> hits(s"__g_$c")).reduce(_ && _)
    val out = coalesce(hits("hits"), lit(0L)).as("hits") +:
      valueCol.map(_ =>
        coalesce(hits("win_sum"), lit(0.0)).as("win_sum")).toSeq
    left.join(hits, cond, "left")
      .select(left.columns.toIndexedSeq.map(left(_)) ++ out: _*)
  }
}
