package graft

import graft.pipeline.Models
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property pins for the sufficient-statistics model fitters: on random
  * EXACTLY-linear data ridge (λ→0) must recover the generating weights;
  * the quantized integer score must stay within the quantization error
  * bound of the real-valued score; and the logistic IRLS direction must
  * always score positives above negatives on cleanly separable data. */
object ModelsProps extends Properties("Models") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genWeights: Gen[Seq[Double]] =
    Gen.chooseNum(1, 3).flatMap(p =>
      Gen.listOfN(p + 1, Gen.chooseNum(-5.0, 5.0)))

  property("ridge recovers random exactly-linear relationships") =
    Prop.forAll(genWeights, Gen.chooseNum(30, 80)) { (w, n) =>
      import spark.implicits._
      val p = w.size - 1
      // integer feature grids (co-prime strides) keep X'X well-conditioned
      val strides = Seq(7, 11, 13).take(p)
      val rows = (0 until n).map { i =>
        val fs = strides.map(s => (i % s).toDouble)
        val y = w.head + fs.zip(w.tail).map { case (f, c) => f * c }.sum
        (i.toLong, fs, y)
      }
      val df = rows.toDF("id", "fs", "y")
      val feats = (0 until p).map(j => element_at($"fs", j + 1))
      val m = Models.ridgeFit(df, feats, $"y", lambda = 1e-12)
      m.weights.zip(w).forall { case (g, e) => math.abs(g - e) < 1e-5 }
    }

  property("quantized score within the quantization error bound") =
    Prop.forAll(genWeights,
      Gen.listOfN(3, Gen.chooseNum(0L, 1000L))) { (w, fsAll) =>
      import spark.implicits._
      val p = w.size - 1
      val fs = fsAll.take(p)
      val scale = 1000000L
      val m = Models.LinearModel(w, scale,
        w.map(x => math.round(x * scale)))
      val df = Seq((1L, fs)).toDF("id", "fs")
      val feats = (0 until p).map(j => element_at($"fs", j + 1))
      val row = df.select(Models.scoreQ(m, feats).as("q"),
        Models.score(m, feats).as("s")).head()
      // each rounded weight is off by <= 0.5/scale, amplified by |f|
      val bound = (0.5 + fs.map(math.abs(_).toDouble * 0.5).sum) / scale
      math.abs(row.getLong(0).toDouble / scale - row.getDouble(1)) <=
        bound + 1e-12
    }

  property("logistic ranks separable positives above negatives") =
    Prop.forAll(Gen.chooseNum(1.0, 8.0), Gen.chooseNum(20, 60)) {
      (gap, n) =>
      import spark.implicits._
      val rows = (0 until n).map { i =>
        val x = (i % 10).toDouble + (if (i % 2 == 0) gap + 10.0 else 0.0)
        (i.toLong, x, if (i % 2 == 0) 1.0 else 0.0)
      }
      val df = rows.toDF("id", "x", "y")
      val m = Models.logisticFit(df, Seq($"x"), $"y", lambda = 1e-4,
        iters = 8)
      val scored = df.select($"y", Models.score(m, Seq($"x")).as("eta"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      val posMin = scored.filter(_._1 == 1.0).map(_._2).min
      val negMax = scored.filter(_._1 == 0.0).map(_._2).max
      posMin > negMax
    }

  property("save/load round-trips the model and its feature SQL") =
    Prop.forAll(Gen.listOfN(4, Gen.chooseNum(-5.0, 5.0))) { w =>
      import spark.implicits._
      val m = Models.LinearModel(w, 1000000L,
        w.map(x => math.round(x * 1000000L)))
      // the production feature shapes: column ref, size-of-split chain,
      // distinct count — featureSql must re-parse via expr() to the
      // same semantics (the sidecar's portability contract)
      val feats = Seq(col("n_chars").cast("long"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long"),
        size(array_distinct(split(trim(lower(col("text"))), "\\s+")))
          .cast("long"))
      val dir = s"/tmp/graft_test/models_rt_${math.abs(w.head).toInt}"
      Models.save(spark, dir, "ridge", Models.featureSql(feats), m)
      val got = Models.load(spark, dir)
      val df = Seq((12L, "The  quick brown Fox the fox"))
        .toDF("n_chars", "text")
      val a = df.select(Models.scoreQ(m, feats).as("q")).head().getLong(0)
      val b = df.select(Models.scoreQ(got.model,
        got.features.map(expr)).as("q")).head().getLong(0)
      got.kind == "ridge" && got.model == m && a == b
    }
}
