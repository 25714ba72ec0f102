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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.prepare(spark, sfDir)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          // two timed runs: first includes codegen/JIT warmup, second is
          // steady state — the gap separates fixed from per-row cost
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[prof] $name%-24s ${times(0)}%8.2f s   warm ${times(1)}%8.2f s")
        } catch { case e: Throwable =>
          println(f"[prof] $name%-24s FAILED ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
