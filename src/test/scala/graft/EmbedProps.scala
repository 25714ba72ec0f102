package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check: the sign-LSH-blocked embedding near-dup operator
  * must equal an in-memory model of its EXACT spec — floor(x·1e6)
  * quantization, per-band coordinate-sign bucket words, candidates =
  * co-bucketed in ANY band, verification den²·dot² ≥ num²·‖a‖²·‖b‖² ∧
  * dot ≥ 0 in exact BigInt math. This pins the semantics the DuckDB oracle
  * replicates, independently of both engines. */
object EmbedProps extends Properties("Dedup.embeddingNearDup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val Dim = 8
  private val Bands = 2
  private val RowsPerBand = 4

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(Dim, Gen.chooseNum(-1.0f, 1.0f)).map(_.toSeq)

  private val DefaultCoords: Seq[Seq[Int]] =
    (0 until Bands).map(b => (0 until RowsPerBand).map(j => b * RowsPerBand + j))

  private def model(vecs: Seq[Seq[Float]], num: Int, den: Int,
      coords: Seq[Seq[Int]] = DefaultCoords): Set[(Long, Long, Long)] = {
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000000L).toLong))
    val nrm = q.map(v => v.map(x => BigInt(x) * BigInt(x)).sum)
    def buckets(v: Seq[Long]): Seq[Long] =
      coords.map(_.zipWithIndex.map { case (c, j) =>
        if (v(c) >= 0) 1L << j else 0L
      }.sum)
    val bs = q.map(buckets)
    (for {
      a <- vecs.indices
      b <- vecs.indices
      if a < b
      if coords.indices.exists(k => bs(a)(k) == bs(b)(k))
      dot = q(a).zip(q(b)).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      if nrm(a) > 0 && nrm(b) > 0 && dot >= 0 &&
        BigInt(den * den) * dot * dot >= BigInt(num * num) * nrm(a) * nrm(b)
    } yield (a.toLong, b.toLong, dot.toLong)).toSet
  }

  property("banded operator == in-memory BigInt model") =
    Prop.forAll(Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, genVec)),
        Gen.oneOf((1, 2), (2, 5), (9, 10))) { (vecs, t) =>
      import spark.implicits._
      val (num, den) = t
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val got = Dedup.embeddingNearDupPairs(df, col("vec_id"),
          col("embedding"), thresholdNum = num, thresholdDen = den,
          bands = Bands, rowsPerBand = RowsPerBand)
        .as[(Long, Long, Long)].collect().toSet
      got == model(vecs, num, den)
    }

  /** The r5 high-recall mode: arbitrary SEEDED per-band coordinate choices
    * must still match the in-memory model run over the same choices —
    * pins the semantics q_embed_neardup_hi's generated oracle replicates. */
  property("seeded-band mode == in-memory model over the same coords") =
    Prop.forAll(Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, genVec)),
        Gen.choose(0L, 1000L), Gen.choose(1, 6)) { (vecs, seed, nBands) =>
      import spark.implicits._
      val coords = Dedup.signBandCoords(nBands, RowsPerBand, Dim, seed)
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val got = Dedup.embeddingNearDupPairs(df, col("vec_id"),
          col("embedding"), thresholdNum = 2, thresholdDen = 5,
          bandCoords = Some(coords))
        .as[(Long, Long, Long)].collect().toSet
      got == model(vecs, 2, 5, coords)
    }
}
