package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement tool (not part of the driver contract): winnowPairs
  * candidate-stage behavior under (a) 8× duplication of the real corpus and
  * (b) the adversarial mid-frequency-boilerplate corpus where the absolute
  * threshold's constant-width prefix yields df² false candidates.
  *
  * Usage: runMain graft.WinnowStress [sfDir]
  */
object WinnowStress {

  /** Candidate count of the SHIPPED prefix stage — calls the operator's
    * own `Dedup.winnowCandidates`, so the measurement cannot drift from
    * the plan that ships (the shipped plan carries no counting overhead;
    * the count action lives only here). */
  private def candidates(df: DataFrame, ratioPermille: Option[Int],
      minShared: Int): Long = {
    val base = Dedup.winnowBase(df, col("doc_id"), col("text"),
        col("source"), 5, 8)
      .filter(size(col("fps")) >= ratioPermille.fold(minShared)(_ => 1))
    Dedup.winnowCandidates(base, minShared, ratioPermille).count()
  }

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text")

    // (a) 8× duplication of the real corpus
    val dup8 = (0 until 8).map(i => docs
        .withColumn("doc_id", col("doc_id") * 8 + i))
      .reduce(_ unionByName _)
    for ((label, ratio) <- Seq("absolute(minShared=10)" -> None,
        "ratio(300 permille)" -> Some(300))) {
      val cand = time(s"8x cand $label")(candidates(dup8, ratio, 10))
      val out = time(s"8x pairs $label")(
        Dedup.winnowPairs(dup8, col("doc_id"), col("text"),
          blocking = col("source"), minShared = 10,
          ratioPermille = ratio).count())
      println(s"[stress] 8x $label: candidates=$cand output=$out")
    }

    // (b) adversarial boilerplate: 5000 docs in 50 groups of 100; each doc
    // is ~40 unique pseudo-words plus ONE short snippet shared by its whole
    // group — pairs share ~2-4 fingerprints (< 10, so the absolute-mode
    // output is EMPTY) while the snippet fingerprints are mid-frequency
    // (df ≈ 100, far below any doc's top-9), so the absolute prefix keeps
    // them and generates df²/2-per-group false candidates.
    import spark.implicits._
    // full a-z alphabet for the unique filler (hex-only words collide at the
    // 5-gram level corpus-wide and would drown the snippet signal)
    val adversarial = (0 until 5000).map { i =>
      val rnd = new scala.util.Random(i)
      val unique = Seq.fill(40)(
        String.valueOf(Array.fill(10)(('a' + rnd.nextInt(26)).toChar)))
        .mkString(" ")
      (i.toLong, "s0", s"$unique shared snippet ${i % 50}")
    }.toDF("doc_id", "source", "text")
    for ((label, ratio) <- Seq("absolute(minShared=10)" -> None,
        "ratio(300 permille)" -> Some(300))) {
      val cand = time(s"boilerplate cand $label")(
        candidates(adversarial, ratio, 10))
      val out = Dedup.winnowPairs(adversarial, col("doc_id"), col("text"),
        blocking = col("source"), minShared = 10, ratioPermille = ratio)
        .count()
      println(s"[stress] boilerplate $label: candidates=$cand output=$out")
    }
    spark.stop()
  }
}
