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

  test("one-side-shuffle SPJ: a computed frame LEFT-joins a bucketed " +
      "graft catalog table with ONE exchange (batch side only), " +
      "unmatched left rows kept — the substrIngest index-join primitive") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_spj_shuffle").toString
    val idx = (0 until 100).map(i => (s"w$i", i.toLong))
      .toDF("k", "cnt").withColumn("p", lit("all"))
    idx.write.format("graft")
      .option("key", "k").option("partition", "p").option("buckets", "8")
      .mode("append").save(s"$root/windex")
    spark.conf.set("spark.sql.catalog.spjshuf",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjshuf.warehouse", root)
    val hist = spark.table("spjshuf.windex").select($"k", $"cnt")
    // half known keys, half new — the left join must keep all 100
    val batch = ((0 until 50).map(i => s"w${i * 2}") ++
      (0 until 50).map(i => s"new$i")).toDF("k")
      .withColumn("bcnt", lit(1L))
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def joined = batch.join(hist, Seq("k"), "left")
        .select($"k", ($"bcnt" + coalesce($"cnt", lit(0L))).as("total"))
      val plain = joined.collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled",
        "true")
      val spjDf = joined
      val spj = spjDf.collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap
      assert(spj == plain && spj.size == 100,
        "SPJ left join changed results")
      // AQE's toString appends an "Initial Plan" section — assert on the
      // final plan only
      val plan = spjDf.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected exactly 1 exchange:\n$plan")
      assert(plan.contains("keygroupedpartitioning"),
        s"batch side must shuffle into the index bucket layout:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(root))
    }
  }
}
