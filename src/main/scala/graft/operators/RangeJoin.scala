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
    * hit counts aggregate per left-row GROUP BY, which treats nulls as
    * equal, so a left row carrying a null in any column still reports its
    * own count (and duplicate left rows would merge into one output row).
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

  /** The shared bucket/replicate/join core. ONE bucketed LEFT join, then
    * a groupBy over the left columns with null-skipping aggregates:
    * `count(r.col)` counts only matched right rows, so an empty-window
    * left row survives the outer join as a single null-extended row and
    * aggregates to hits = 0 — no second shuffle of `left` and no
    * null-safe re-attach join (the previous shape inner-joined, grouped,
    * and LEFT-joined the hit table back on every left column — a whole
    * extra exchange of the left table, material when left carries wide
    * payload columns). Null-key / null-ts left rows match nothing and
    * report 0, identical to the re-attach semantics.
    */
  private def slidingAgg(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowMicros: Long,
      valueCol: Option[String]): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    // Scratch AND output-name guard (the AsOf payload-collision rule,
    // via the shared Skew helper): withColumn would silently OVERWRITE
    // a caller's same-named scratch column, and a left frame already
    // carrying `hits`/`win_sum` would emit TWO same-named output
    // columns (the groupBy key plus the aggregate) — every downstream
    // select then throws AMBIGUOUS_REFERENCE.
    Skew.requireScratchFree(left,
      Seq("__ltsu", "__bkt", "hits") ++ valueCol.map(_ => "win_sum"),
      "bucketed range join")
    // FLOOR-division bucket in EXACT integer arithmetic. The previous
    // floor(tsu / w) went through Spark's Divide — DOUBLE division,
    // exact only while |tsu| < 2^53 — and bucket equality is a hard
    // join conjunct: one mis-scaled (nanos-in-a-µs-column, the round-7
    // readEvents class) or far-future timestamp rounding across an
    // integer boundary on ONE side silently drops a right row the
    // exact interval predicate would have matched. Subtracting pmod
    // (always >= 0) makes the dividend exactly divisible, so DIV —
    // which truncates toward zero and would mis-bucket bare negative
    // timestamps — is the true floor quotient at every magnitude.
    def floorBkt(tsuName: String): org.apache.spark.sql.Column =
      expr(s"($tsuName - pmod($tsuName, ${windowMicros}L))" +
        s" DIV ${windowMicros}L")
    val l = left.withColumn("__ltsu", unix_micros(col(leftTs)))
      .withColumn("__bkt", floorBkt("__ltsu"))
    // Null-key / null-ts right rows can never satisfy the equi-join but
    // would still be DOUBLED by the two-bucket replication and shipped
    // through the exchange — drop them before replicating (the AsOf
    // right-side discipline; results identical).
    val rBase = right
      .where(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        col(key).as("__rk") +: unix_micros(col(rightTs)).as("__rtsu") +:
          valueCol.map(v => col(v).as("__rv")).toSeq: _*)
      .withColumn("__rbkt0", floorBkt("__rtsu"))
    val r = rBase.select(
      col("__rk") +: col("__rtsu") +:
        (valueCol.map(_ => col("__rv")).toSeq :+
          // outer + isNotNull, the repo-wide exploder convention: the
          // two-element bucket array is provably non-empty/non-null, but
          // the inner form is exactly the shape InferFiltersFromGenerate
          // regressions ship through when a later edit makes the array
          // derived-and-expensive (the bm25 postings lesson).
          explode_outer(array(col("__rbkt0"), col("__rbkt0") + 1))
            .as("__bkt")): _*)
      .where(col("__bkt").isNotNull)
    val aggs = count(r("__rk")).as("hits") +:
      valueCol.map(_ => coalesce(sum(r("__rv")), lit(0.0)).as("win_sum")).toSeq
    l.join(r,
        l(key) === r("__rk") && l("__bkt") === r("__bkt") &&
          r("__rtsu") >= l("__ltsu") - windowMicros &&
          r("__rtsu") < l("__ltsu"),
        "left")
      .groupBy(left.columns.toIndexedSeq.map(c => l(c).as(c)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
