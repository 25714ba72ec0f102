package graft

import graft.util.BucketedTables
import org.apache.spark.sql.functions._

/** Co-located joins via bucketed tables: writing both sides bucketed on the
  * join key makes every subsequent equi-join and keyed aggregation plan
  * WITHOUT an Exchange — the write-once/pre-shuffled scale path. */
class BucketedJoinSpec extends SparkSpec {

  test("same-key bucketed join and aggregation plan with NO exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
    BucketedTables.writeBucketed(
      orders, "b_orders", "o_orderkey", buckets = 8)
    BucketedTables.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", buckets = 8)

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.table(spark, "b_orders")
        .join(BucketedTables.table(spark, "b_lineitem"), "o_orderkey")
      val n = joined.count()
      assert(n == lineitem.count(),
        "every lineitem row must find its order")
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"),
        s"bucketed join still shuffles:\n$joinPlan")

      val agg = BucketedTables.table(spark, "b_lineitem")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      agg.count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"keyed aggregation over bucketed table still shuffles:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
