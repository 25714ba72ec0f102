package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Scratch driver: column-stats file skipping end-to-end. NOT committed. */
object VerifyScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_drive/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = "/tmp/graft_drive/stats_e2e"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)

    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.write.format("graft")
      .option("key", "o_orderkey").option("partition", "o_orderstatus")
      .option("buckets", "8").option("stats", "o_totalprice,o_orderdate")
      .option("ts", "20260101000000").save(dir)

    def scanFiles(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val rows = df.count()
      val scans = df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }
      val planned = scans.map(s => s.relation.location
        .listFiles(s.partitionFilters, s.dataFilters)
        .map(_.files.length).sum).sum
      (rows, planned)
    }

    val snap = graft.read.SnapshotReader.read(spark, dir)
    val total = snap.inputFiles.length
    println(s"[stats] table has $total files")

    // key point lookup
    val k = orders.select($"o_orderkey").as[Long].head().toString
    val (r1, f1) = scanFiles(snap.filter(col("_hoodie_record_key") === k))
    println(s"[stats] key=$k lookup: rows=$r1 files=$f1 (want rows=1, files=1)")

    // hot-column range
    val (r2, f2) = scanFiles(snap.filter($"o_totalprice" > 999999999))
    println(s"[stats] impossible price range: rows=$r2 files=$f2 (want 0, 0)")

    val mx = orders.agg(max($"o_totalprice")).head().getDouble(0)
    val (r3, f3) = scanFiles(snap.filter($"o_totalprice" === mx))
    println(s"[stats] max-price point: rows=$r3 files=$f3 (files << $total)")

    // no-filter control: all files
    val (r4, f4) = scanFiles(snap)
    println(s"[stats] control no-filter: rows=$r4 files=$f4 (want files=$total)")

    // format surface read path
    val fmt = spark.read.format("graft").load(dir)
    val (r5, f5) = scanFiles(fmt.filter(col("_hoodie_record_key") === k))
    println(s"[stats] format-read key lookup: rows=$r5 files=$f5 (want 1, 1)")

    // update commit: stats recorded for the rewritten slice too
    spark.sql(s"CREATE TABLE g_stats USING graft OPTIONS (path '$dir')")
    spark.sql(s"UPDATE g_stats SET o_totalprice = 1 WHERE o_orderkey = $k")
    spark.sql("DROP TABLE g_stats")
    val snap2 = graft.read.SnapshotReader.read(spark, dir)
    val (r6, f6) = scanFiles(snap2.filter(col("_hoodie_record_key") === k))
    println(s"[stats] post-DML key lookup: rows=$r6 files=$f6 (want 1, small)")

    // correctness: skipped read == unskipped read for a selective filter
    val a = snap2.filter($"o_totalprice" < 1000).agg(count(lit(1))).head().getLong(0)
    val b = spark.read.parquet(dir + "/*/[!.]*.parquet") // raw, no skipping
    println(s"[stats] selective-filter correctness: graft=$a")

    spark.stop()
    println("[stats] DONE")
  }
}
