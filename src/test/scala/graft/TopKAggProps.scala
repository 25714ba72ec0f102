package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property pins for [[graft.functions.TopKAgg]]: the bounded top-k
  * partial aggregate must be BIT-IDENTICAL to the rank-window idiom it
  * replaces on the kNN-join paths —
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC) <= k`
  * — including duplicate scores (id tiebreak), non-finite scores under
  * Spark's fp total order (NaN > +Inf > finite > −Inf), groups smaller
  * than k, and k = 1. Inputs are generated score-heavy in ties so the
  * heap's equal-score eviction rule is exercised every case. */
object TopKAggProps extends Properties("TopKAgg") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private val genScore: Gen[Double] = Gen.frequency(
    6 -> Gen.chooseNum(-3, 3).map(_.toDouble / 2), // heavy ties
    2 -> Gen.chooseNum(-1e9, 1e9).map(_.toDouble),
    1 -> Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity,
      Double.NaN, 0.0, -0.0))
  private val genRows: Gen[List[(Long, Double, Long)]] =
    Gen.chooseNum(1, 120).flatMap(n => Gen.listOfN(n,
      for {
        g <- Gen.chooseNum(0L, 5L)
        s <- genScore
        i <- Gen.chooseNum(0L, 1000L)
      } yield (g, s, i)))

  property("groupBy + topK == rank window (ties, NaN/Inf, small groups)") =
    Prop.forAll(genRows, Gen.chooseNum(1, 7)) { (rows, k) =>
      import spark.implicits._
      val df = rows.toDF("g", "score", "id").repartition(5)
      val agg = df.groupBy("g")
        .agg(graft.functions.TopKAgg.topK(col("score"), col("id"), k)
          .as("tk"))
        .select(col("g"), posexplode(col("tk")).as(Seq("p", "e")))
        .select(col("g"), (col("p") + 1).cast("int").as("rank"),
          col("e.id").as("id"), col("e.score").as("score"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3))))
        .toSet
      val w = Window.partitionBy("g")
        .orderBy(col("score").desc, col("id").asc)
      val win = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("rank"), col("id"), col("score"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3))))
        .toSet
      // identical (g, rank, id, bit-exact score) sets. Rows with the SAME
      // (score, id) within a group are interchangeable under both forms,
      // and bit-compare keeps NaN payloads honest while 0.0 == -0.0
      // stays a legal tie (both orders sort them equal-score, id breaks).
      // Normalize -0.0 to 0.0 on both sides for the bit compare.
      def norm(s: Set[(Long, Int, Long, Long)]) = s.map { case (g, r, i, b) =>
        val d = java.lang.Double.longBitsToDouble(b)
        (g, r, i, java.lang.Double.doubleToLongBits(
          if (d == 0.0) 0.0 else d))
      }
      Prop(norm(agg) == norm(win)) :|
        s"k=$k agg=${norm(agg).toSeq.sorted} win=${norm(win).toSeq.sorted}"
    }
}
