package graft
import org.apache.spark.sql.SparkSession

/** Isolated-query profiling driver (optimization rounds, guide §1).
  *
  * Args: <queryName>[,<queryName>...] [passes] [planOutDir]
  *
  * Runs each named SparkEntry query with the BENCH methodology (same
  * session shape as Bench: local[$SPARK_GRAFT_CPUS], shuffle.partitions =
  * cpus, noop sink so every output column is computed) — one untimed
  * warmup, then `passes` timed runs reporting min/median — and, when
  * `planOutDir` is given, writes `.explain("formatted")` to
  * <planOutDir>/<query>.txt. Jobs are labelled per query so the UI / event
  * logs attribute stages. Prints one JSON line per query. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val passes = if (args.length > 1) args(1).toInt else 3
    val planDir = if (args.length > 2) Some(args(2)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.prepare(spark, sfDir)
    val byName = SparkEntry.queries
    names.foreach { name =>
      val fn = byName.getOrElse(name,
        sys.error(s"unknown query $name; known: ${byName.keys.toSeq.sorted.take(5).mkString(",")}..."))
      planDir.foreach { dir =>
        new java.io.File(dir).mkdirs()
        // r18: scoped operators checkpoint internally, so the returned
        // frame's explain shows a Scan ExistingRDD stub — install the
        // PlanProbe sink so each INNER (pre-checkpoint) frame's plan is
        // captured too, as <query>__inner<i>_<label>.txt (capped; label
        // repeats index for iterative operators). Uninstalled before any
        // timing below.
        val innerN = new java.util.concurrent.atomic.AtomicInteger(0)
        graft.util.PlanProbe.install { (label, plan) =>
          val i = innerN.incrementAndGet()
          if (i <= 12)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$dir/${name}__inner${i}_$label.txt"),
              plan.getBytes("UTF-8"))
        }
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/$name.txt"),
            plan.getBytes("UTF-8"))
        } finally graft.util.PlanProbe.uninstall()
      }
      spark.sparkContext.setJobDescription(s"warmup: $name")
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val times = (1 to passes).map { p =>
        spark.sparkContext.setJobDescription(s"timed $p: $name")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      def r3(d: Double) = math.rint(d * 1000) / 1000
      println(s"""{"query":"$name","min":${r3(sorted.head)},""" +
        s""""median":${r3(sorted(sorted.size / 2))},""" +
        s""""times":[${times.map(r3).mkString(",")}]}""")
    }
    spark.stop()
  }
}
