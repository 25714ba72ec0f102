package graft

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DriveScratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    val docs = df.select(col("doc_id").cast("long").as("id"),
      Dedup.shingleSet(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingles")(docs.count())
    val sigs = docs.withColumn("sig",
      Dedup.minhashSignature(col("shingles"), 32))
    time("signatures")(sigs.count())
    time("signatures-forced")(sigs.select(sum(element_at(col("sig"), 1))).head())
    val bucketed = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b.cast("int") * 2 + 1, lit(2)), b))))
      .toDF("id", "band", "bucket")
    time("bucketed-forced")(bucketed.select(sum("bucket")).head())
    time("full")(Dedup.minhashPairs(df, col("doc_id"), col("text"),
      n = 3, numHashes = 32, bands = 16, thresholdPermille = 500).count())
    spark.stop()
  }
}
