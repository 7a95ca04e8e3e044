package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TrendConfig
import graft.operators.PageAggregates
import graft.sources.EventAdapter

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching ANSI-SQL oracle in `oracleSql`
  * (DuckDB, same parquet tables) unless the operator is inherently
  * non-SQL-expressible (hash-seeded sketches), in which case the driver
  * records a rows-only check.
  *
  * Output-column convention: lower_snake_case on BOTH sides, every
  * computed column explicitly aliased (driver compare sorts by column
  * name before hashing).
  */
object SparkEntry {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Global as-of instant for trend metrics: max event ts (deterministic —
    * the reference uses wall clock, SURVEY §7.4 item 3 pins it to a param).
    */
  private def withAsOf(events: DataFrame, df: DataFrame): DataFrame =
    df.crossJoin(broadcast(events.agg(max(col("ts")).as("as_of"))))

  // ---------------------------------------------------------------------
  // Flagship: the reference's core use-case — "what's trending right now"
  // (read events → filter/classify → keyed agg → rate metric → top-k).
  // ---------------------------------------------------------------------
  def entry(spark: SparkSession): DataFrame =
    trendTopk(spark, "/root/testdata/sf0.001")

  private def trendPages(spark: SparkSession, sfDir: String): DataFrame =
    PageAggregates.pageAggregates(EventAdapter.recentChanges(spark, sfDir))

  private def epmCol: Column = {
    val ageMins = (col("as_of").cast("double") - col("start").cast("double")) / 60.0
    when(ageMins < 1.0 || col("edits") === 0L, col("edits").cast("double"))
      .otherwise(col("edits").cast("double") / ageMins)
  }

  private def trendTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = EventAdapter.readEvents(spark, sfDir)
    withAsOf(ev, trendPages(spark, sfDir))
      .withColumn("epm", epmCol)
      .select(col("id"), col("edits"), col("epm"))
      .orderBy(desc("epm"), asc("id"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // Query registry (driver runs each at sf0.01 and hash-compares to the
  // DuckDB oracle below).
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q1-style scan+agg: conditional sums, avg, count (SURVEY §2.2 aggs).
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Filter+projection pushed to the parquet scan (PushedFilters/ReadSchema).
    "q2_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
                col("l_discount") > 0.05 && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    }),

    // Three-way join (fact-fact-dim) + agg; Catalyst picks broadcast for
    // customer at small SF, sort-merge at scale (AQE decides).
    "q3_join" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(c("c_custkey").as("custkey"), c("c_mktsegment").as("mktsegment"))
        .agg(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"),
             count(lit(1)).as("n_items"))
    }),

    // Trend core: the reference's A1 keyed aggregation over the adapted
    // events stream (SURVEY §2.3 column algebra, oracle-exact).
    "trend_page_stats" -> ((s, dir) => {
      trendPages(s, dir).select(
        col("id"),
        col("edits"),
        col("anonEdits").as("anon_edits"),
        col("isNew").as("is_new"),
        col("notabilityFlags").as("notability_flags"),
        col("volatileFlags").as("volatile_flags"),
        col("reverts"),
        col("bytesChanged").as("bytes_changed"),
        date_format(col("start"), "yyyy-MM-dd HH:mm:ss").as("start_s"),
        date_format(col("updated"), "yyyy-MM-dd HH:mm:ss").as("updated_s"))
    }),

    // Trend board: top-k by edits-per-minute (M3 + Q3 of the reference);
    // plans as TakeOrderedAndProject.
    "trend_topk" -> ((s, dir) => trendTopk(s, dir))
  )

  def oracleSql: Map[String, String] = Map(

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         sum(l_extendedprice) AS sum_base_price,
         sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
         avg(l_quantity) AS avg_qty,
         CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",

    "q2_filter" ->
      """SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_discount > 0.05 AND l_quantity < 24""",

    "q3_join" ->
      """SELECT c.c_custkey AS custkey, c.c_mktsegment AS mktsegment,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
         CAST(count(*) AS BIGINT) AS n_items
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         GROUP BY 1, 2""",

    // Restates the EventAdapter mapping (graft.sources.EventAdapter) in
    // ANSI SQL: revert ⟺ event_type='error'; bot ⟺ user_id%11=0;
    // anon ⟺ user_id%5=0; notability ⟺ 'view'; volatility ⟺ 'click';
    // delta = floor(value*100); isNew ⟺ any 'signup'.
    "trend_page_stats" ->
      """SELECT CAST(user_id AS VARCHAR) AS id,
         CAST(SUM(CASE WHEN event_type <> 'error' AND user_id % 11 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS edits,
         CAST(SUM(CASE WHEN event_type <> 'error' AND user_id % 11 <> 0 AND user_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS anon_edits,
         BOOL_OR(event_type = 'signup') AS is_new,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS notability_flags,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS volatile_flags,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS reverts,
         CAST(SUM(CASE WHEN event_type = 'error' OR user_id % 11 <> 0 THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS bytes_changed,
         STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
         STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS updated_s
         FROM events GROUP BY 1""",

    "trend_topk" ->
      """WITH p AS (
           SELECT CAST(user_id AS VARCHAR) AS id,
             CAST(SUM(CASE WHEN event_type <> 'error' AND user_id % 11 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS edits,
             MIN(ts) AS start
           FROM events GROUP BY 1),
         m AS (
           SELECT id, edits,
             (epoch((SELECT MAX(ts) FROM events)) - epoch(start)) / 60.0 AS age
           FROM p)
         SELECT id, edits,
           CASE WHEN age < 1 OR edits = 0 THEN CAST(edits AS DOUBLE)
                ELSE CAST(edits AS DOUBLE) / age END AS epm
         FROM m ORDER BY epm DESC, id LIMIT 10"""
  )
}
