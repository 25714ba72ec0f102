package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling driver (not committed): knnJoinPq phase timings. */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warmup both paths
    pipeline.Similarity.knnJoinPq(e, col("vec_id"), col("embedding"), k = 3,
      nlist = 8, nprobe = 8, dim = 64, ksub = 64, rerank = 1 << 30)
      .write.format("noop").mode("overwrite").save()
    val base = e.select(col("vec_id").cast("long").as("id"),
      col("embedding").as("v"))
    t("ivfTrainOcc alone") {
      pipeline.Similarity.ivfTrainOcc(base, col("id"), col("v"), 8, 2, 42L,
        1.0, withOccupancy = true)
    }
    t("pqTrain alone (ksub=64)") {
      pipeline.Similarity.pqTrain(base, col("id"), col("v"), 64, 8, 64, 2, 42L, 1.0)
    }
    t("opqTrain alone (ksub=64, opqIters=2)") {
      pipeline.Similarity.opqTrain(base, col("id"), col("v"), 64, 8, 64, 2, 2, 42L, 1.0)
    }
    t("knnJoinPq full (pq)") {
      pipeline.Similarity.knnJoinPq(e, col("vec_id"), col("embedding"), k = 3,
        nlist = 8, nprobe = 8, dim = 64, ksub = 64, rerank = 1 << 30)
        .write.format("noop").mode("overwrite").save()
    }
    t("knnJoinPq full (opq)") {
      pipeline.Similarity.knnJoinPq(e, col("vec_id"), col("embedding"), k = 3,
        nlist = 8, nprobe = 8, dim = 64, ksub = 64, rerank = 1 << 30,
        opqIters = 2)
        .write.format("noop").mode("overwrite").save()
    }
    t("knnJoinPq rerank=0 (pq, graph mode)") {
      pipeline.Similarity.knnJoinPq(e, col("vec_id"), col("embedding"), k = 3,
        nlist = 8, nprobe = 8, dim = 64, ksub = 64, rerank = 0)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
