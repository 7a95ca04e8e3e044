package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.sources.Bucketing

/** Bucketed-layout spec: a join of two tables bucketed on the join key
  * must plan with ZERO shuffle exchanges (the at-rest layout replaces the
  * per-query repartition), and must return the same rows as the plain
  * join of the unbucketed data.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of same-bucketed tables plans without a shuffle exchange") {
    val orders = (0L until 200L).map(k => (k, s"o$k")).toDF("key", "o_payload")
    val items = (0L until 600L).map(i => (i % 200L, s"i$i")).toDF("key", "i_payload")
    Bucketing.saveBucketed(orders, "b_orders", "key", 4)
    Bucketing.saveBucketed(items, "b_items", "key", 4)
    // Force a non-broadcast join so the exchange-elision is what's tested.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedEquiJoin(spark, "b_orders", "b_items", "key")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"expected no shuffle exchange, got:\n${joined.queryExecution.executedPlan}")
      val plain = orders.join(items, Seq("key"))
      assert(joined.count() == 600L)
      assert(joined.count() == plain.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("aggregation on the bucket key skips the exchange too") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("b_items").groupBy("key").count()
      val exchanges = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"expected no shuffle exchange, got:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == 200L)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
