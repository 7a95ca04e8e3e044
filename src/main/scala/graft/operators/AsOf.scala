package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal) join: for each left row, attach the payload of the
  * LATEST right row with the same key and `rightTs <= leftTs` — the
  * event-attribution / point-in-time-lookup operator (classic uses: trade
  * vs latest quote, purchase vs latest ad view, edit vs current protection
  * level). Spark has no built-in as-of join; the naive encoding is a
  * non-equi theta join (`l.key = r.key AND r.ts <= l.ts` + a max per left
  * row), which Spark can only execute as a broadcast nested loop — O(|L|
  * × |R|) per key and a scale killer.
  *
  * This implementation is the scalable shape: UNION the two sides tagged
  * left/right, then ONE window pass per key ordered by (ts, side) carrying
  * the latest right row's payload STRUCT forward (`last(struct, ignoreNulls)
  * over rowsBetween(unboundedPreceding, currentRow)` — the struct is
  * non-null for every right row even when its fields are null, so the
  * carry picks whole rows; per-column ignoreNulls carries would stitch
  * values from DIFFERENT right rows whenever the latest row holds a null
  * payload field). Cost is one shuffle on the key + one sort — the same
  * plan Flink/kdb-style as-of engines lower to, and it never materializes
  * a pair table. Right rows sort BEFORE left rows at equal timestamps,
  * giving the standard inclusive (`<=`) as-of semantics.
  *
  * Determinism: if the right side can hold several rows per (key, ts),
  * pre-aggregate it (the window's tie order would otherwise be partition-
  * layout-dependent). The payload columns must not collide with left
  * column names.
  *
  * Null semantics match the documented predicate, not the window's
  * accidents: a right row with a NULL timestamp can never satisfy
  * `rightTs <= leftTs` (under nulls-first ordering it would otherwise
  * sort ahead of everything and donate its payload to every left row),
  * and a NULL key never equi-matches (the partition would otherwise
  * group null-key rows together) — both are filtered off the right side.
  * Null-key/null-ts LEFT rows still emit, with a null payload — but they
  * BYPASS the window entirely: they can only ever produce a null payload,
  * and routing them through `partitionBy(__k)` would pile every null-key
  * row of the corpus onto the single NULL partition's task (a hot-task
  * skew hazard at crawl scale, where missing keys are common).
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    // Fail fast on the documented precondition: a payload name colliding
    // with a left column would emit two same-named output columns that
    // only error (or silently misread) downstream.
    val collisions = payload.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"asOfJoin payload column(s) ${collisions.mkString(", ")} collide " +
        "with left columns — alias them on the right side first")
    val leftRowType = StructType(left.schema.fields)
    val payloadType = StructType(payload.map(p => right.schema(p)).toArray)
    val joinable = col(key).isNotNull && col(leftTs).isNotNull
    val l = left.where(joinable).select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__row"),
      lit(null).cast(payloadType).as("__p"))
    val r = right
      .where(col(rightTs).isNotNull && col(key).isNotNull)
      .select(
        col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(leftRowType).as("__row"),
        struct(payload.map(col): _*).as("__p"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .select(col("__side"), col("__row"),
        last(col("__p"), ignoreNulls = true).over(w).as("__p"))
      .filter(col("__side") === 1)
      .select(col("__row.*") +: payload.map(p => col("__p")(p).as(p)): _*)
    val bypassed = left.where(!joinable)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    matched.unionByName(bypassed)
  }
}
