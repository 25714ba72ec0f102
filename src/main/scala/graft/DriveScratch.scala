package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc local profiler: times selected SparkEntry queries (all if no
  * filter given) against a scale-factor dir. Not part of the driver
  * contract — dev tool only.
  *
  * Usage: runMain graft.DriveScratch <sfDir> [queryNameSubstring...]
  */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.prepare(spark, sfDir)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        } catch { case e: Throwable =>
          println(f"[prof] $name%-24s FAILED ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
