package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property pins for [[Dedup.semDedupKeep]] against an in-memory BigInt
  * model of its EXACT spec — floor(x·1e6) quantization, cluster =
  * first-max integer anchor dot, drop iff a smaller-id same-cluster member
  * verifies den²·dot² ≥ num²·‖a‖²·‖b‖² ∧ dot ≥ 0 ∧ norms > 0. This pins
  * the semantics q_sem_dedup's generated DuckDB oracle replicates,
  * independently of both engines; plus the maxCluster cap contract
  * (capped keep set ⊇ lossless — fewer verified pairs, never more drops —
  * and an inactive cap is exactly lossless). */
object SemDedupProps extends Properties("Dedup.semDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val Dim = 8

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(Dim, Gen.chooseNum(-1.0f, 1.0f)).map(_.toSeq)

  private def model(vecs: Seq[Seq[Float]], anchors: Seq[Seq[Long]],
      num: Int, den: Int): Set[(Long, Int)] = {
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000000L).toLong))
    val nrm = q.map(v => v.map(x => BigInt(x) * BigInt(x)).sum)
    def dot(a: Seq[Long], b: Seq[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    val cl = q.map { v =>
      val dots = anchors.map(w => dot(v, w))
      dots.indexOf(dots.max) // first max on ties
    }
    def nearDup(a: Int, b: Int): Boolean = {
      val d = dot(q(a), q(b))
      nrm(a) > 0 && nrm(b) > 0 && d >= 0 &&
        BigInt(den * den) * d * d >= BigInt(num * num) * nrm(a) * nrm(b)
    }
    vecs.indices.filterNot(b => vecs.indices.exists(a =>
      a < b && cl(a) == cl(b) && nearDup(a, b)))
      .map(i => (i.toLong, cl(i))).toSet
  }

  property("fixed-anchor keep set == in-memory BigInt model") =
    Prop.forAll(Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, genVec)),
        Gen.choose(0L, 1000L), Gen.choose(1, 5),
        Gen.oneOf((1, 2), (2, 5), (9, 10))) { (vecs, seed, k, t) =>
      import spark.implicits._
      val (num, den) = t
      val anchors = Dedup.rademacherAnchors(k, Dim, seed)
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val got = Dedup.semDedupKeep(df, col("vec_id"), col("embedding"),
          anchors, thresholdNum = num, thresholdDen = den)
        .as[(Long, Int)].collect().toSet
      got == model(vecs, anchors, num, den)
    }

  property("maxCluster cap: keeps ⊇ lossless; inactive cap == lossless") =
    Prop.forAll(Gen.choose(4, 12).flatMap(n => Gen.listOfN(n, genVec)),
        Gen.choose(0L, 1000L), Gen.choose(1, 3)) { (vecs, seed, cap) =>
      import spark.implicits._
      val anchors = Dedup.rademacherAnchors(2, Dim, seed)
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      def keeps(maxCluster: Int): Set[(Long, Int)] =
        Dedup.semDedupKeep(df, col("vec_id"), col("embedding"), anchors,
          thresholdNum = 2, thresholdDen = 5, maxCluster = maxCluster)
          .as[(Long, Int)].collect().toSet
      val lossless = keeps(Int.MaxValue)
      lossless.subsetOf(keeps(cap)) &&
        keeps(vecs.size) == lossless
    }

  property("trained-centroid mode == fixed-anchor mode over its anchors") =
    Prop.forAll(Gen.choose(3, 10).flatMap(n => Gen.listOfN(n, genVec)),
        Gen.choose(0L, 1000L)) { (vecs, seed) =>
      import spark.implicits._
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val trained = Dedup.semDedupTrainedKeep(df, col("vec_id"),
          col("embedding"), nlist = 2, thresholdNum = 2, thresholdDen = 5,
          seed = seed)
        .as[(Long, Int)].collect().toSet
      // re-derive the anchors exactly as semDedupTrainedKeep does and run
      // the fixed-anchor operator: the delegation must be observable
      val cents = graft.pipeline.Similarity.ivfTrain(df, col("vec_id"),
        col("embedding"), nlist = 2, iters = 2, seed = seed)
      val anchors = cents.sortBy(_._1).map { case (_, v) =>
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (n == 0.0) v.map(_ => 0L): Seq[Long]
        else v.map(x => math.floor(x / n * 1000000L).toLong): Seq[Long]
      }
      val fixed = Dedup.semDedupKeep(df, col("vec_id"), col("embedding"),
          anchors, thresholdNum = 2, thresholdDen = 5)
        .as[(Long, Int)].collect().toSet
      trained == fixed
    }
}
