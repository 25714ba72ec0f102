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
      minShared: Int, dfCap: Option[Int] = None): Long = {
    val base = Dedup.winnowBase(df, col("doc_id"), col("text"),
        col("source"), 5, 8)
      .filter(size(col("fps")) >= ratioPermille.fold(minShared)(_ => 1))
    Dedup.winnowCandidates(base, minShared, ratioPermille, dfCap).count()
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
    // Posting-size histogram of corpus (b)'s prefix: measured r5, its
    // candidates come from ~20k postings of size ≤ 2 — per-posting fan-out
    // is already minimal, so NO posting cap (≥ 2) can reduce them. The cap
    // targets the HOT-posting component of the df² corner, measured on (c).
    for (cap <- Seq(16, 32)) {
      val cand = time(s"boilerplate cand absolute dfCap=$cap")(
        candidates(adversarial, None, 10, Some(cap)))
      println(s"[stress] boilerplate absolute dfCap=$cap: candidates=$cand")
    }

    // (c) HOT boilerplate — the df² corner the cap is for: docs mix three
    // of ten shared "license paragraphs" (pool fps df ≈ 0.3·n, far more
    // than the constant 9 the absolute prefix can exclude, so ~half of
    // each doc's pool fps stay IN the prefix) plus a group snippet
    // (df ≈ 100). Hot in-prefix postings of ~900 docs yield C(df,2)-scale
    // candidates; dfCap truncates each posting to its cap smallest ids.
    // ten mutually gram-distinct paragraphs (a letter prefix shifts every
    // word, so paragraphs share no 5-grams). Measured r5: a boilerplate-
    // heavy corpus has O(n²) TRUE near-copies too (most co-bucketed pairs
    // here genuinely share ≥ minShared fps), so the quadratic blow-up hits
    // candidates AND output — the cap bounds the candidate stage either
    // way, and representative-based dedup (pair with Dedup.clusters) does
    // not need the full quadratic pair set.
    val pool = (0 until 10).map { p =>
      val c = ('a' + p).toChar
      s"${c}qklv ${c}wrtn ${c}zpmh ${c}xcdg ${c}jfsb ${c}ynua ${c}eiok"
    }
    val hot = (0 until 3000).map { i =>
      val rnd = new scala.util.Random(1000 + i)
      val unique = Seq.fill(15)(
        String.valueOf(Array.fill(10)(('a' + rnd.nextInt(26)).toChar)))
        .mkString(" ")
      val snippets = Seq(i % 10, (i + 3) % 10, (i + 6) % 10).map(pool)
      (i.toLong, "s0",
        s"$unique ${snippets.mkString(" ")} shared snippet ${i % 30}")
    }.toDF("doc_id", "source", "text")
    for ((label, cap) <- Seq("uncapped" -> None, "dfCap=16" -> Some(16),
        "dfCap=32" -> Some(32))) {
      val cand = time(s"hot-boilerplate cand absolute $label")(
        candidates(hot, None, 10, cap))
      val out = Dedup.winnowPairs(hot, col("doc_id"), col("text"),
        blocking = col("source"), minShared = 10, dfCap = cap).count()
      println(s"[stress] hot-boilerplate absolute $label: " +
        s"candidates=$cand output=$out")
    }
    spark.stop()
  }
}
