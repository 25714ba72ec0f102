package graft

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** scratch: ngram stage breakdown (delete before commit) */
object Drive2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f;
      println(f"[t] $l ${(System.nanoTime()-t0)/1e9}%.2f"); r }
    val base = graft.util.ParallelScan.widen(
        docs.select(col("doc_id").as("id"), col("source").as("block"), col("text").as("__text")))
      .select(col("id"), col("block"), Dedup.shingleSet(col("__text"), 2).as("shingles"))
      .persist()
    time("materialize_base")(base.count())
    val exploded = base.select(col("id"), col("block"), size(col("shingles")).as("sz"), explode(col("shingles")).as("sh"))
    time("exploded_count")(exploded.count())
    val dfreq = exploded.groupBy("sh").agg(count(lit(1)).as("__df"))
    time("dfreq")(dfreq.count())
    val wOrd = Window.partitionBy("id").orderBy(col("__df").asc, col("sh").asc)
    val prefix = exploded.join(dfreq, "sh").withColumn("__rn", row_number().over(wOrd))
      .filter(col("__rn") <= col("sz") - ceil(col("sz") * 200 / 1000) + 1)
      .select("id", "block", "sh", "sz").persist()
    time("prefix")(println(s"[t] prefixRows=${prefix.count()} of ${exploded.count()}"))
    val cand = prefix.select(col("block"), col("sh"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(prefix.select(col("block"), col("sh"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("block", "sh"))
      .filter(col("id_a") < col("id_b") && col("sz_b")*1000 >= col("sz_a")*200 && col("sz_a")*1000 >= col("sz_b")*200)
      .select("id_a", "id_b").distinct().persist()
    time("candidates")(println(s"[t] candRows=${cand.count()}"))
    val arrays = base.select(col("id"), col("shingles"))
    val out = cand.join(arrays.select(col("id").as("id_a"), col("shingles").as("__sa")), "id_a")
      .join(arrays.select(col("id").as("id_b"), col("shingles").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"), size(array_intersect(col("__sa"), col("__sb"))).cast("long").as("inter"),
        size(col("__sa")).cast("long").as("sz_a"), size(col("__sb")).cast("long").as("sz_b"))
      .withColumn("j", floor(col("inter")*lit(1000)/(col("sz_a")+col("sz_b")-col("inter"))).cast("long"))
      .filter(col("j") >= 200)
    time("verify")(println(s"[t] out=${out.count()}"))
    spark.stop()
  }
}
