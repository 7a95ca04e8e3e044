package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the at-rest partitioning that makes repeated
  * joins/aggregations on a key EXCHANGE-FREE. `bucketBy(n, key)` hashes
  * rows into n files per partition at write time and records the layout in
  * the catalog; a later equi-join of two tables bucketed on the same key
  * with the same n reads co-located buckets and skips both shuffles (the
  * sort can also be skipped when `sortBy` matched).
  *
  * This is the 100 TB answer for FACT-to-FACT joins that recur across a
  * pipeline (events↔events, lineitem↔orders): broadcast only works for
  * dimension-sized sides, and per-query `repartition` pays the shuffle
  * every run — bucketing pays it once at ingest. The cost: a fixed bucket
  * count (choose for the target cluster's parallelism) and catalog-managed
  * tables instead of bare parquet paths.
  */
object Bucketing {

  /** Write `df` as a catalog table bucketed (and sorted) by `key`.
    *
    * The repartition on the bucket key matters twice: without it each of
    * the writer's input partitions emits its own file into every bucket
    * (up to tasks×buckets files), and Spark only claims a bucketed
    * scan's output ORDERING when each bucket holds at most ONE file — so
    * the sortBy elision this module promises silently stops applying.
    * `repartition(buckets, col(key))` uses the same murmur3-pmod layout
    * as the bucket assignment, so every task holds exactly one bucket's
    * rows: one file per bucket, sort claim intact.
    */
  def saveBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key — plans with
    * zero ShuffleExchange (verified by `BucketingSpec`).
    */
  def bucketedEquiJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
