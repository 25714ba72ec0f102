package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property pins for the histogram-refinement exact quantiles: against an
  * in-memory sorted-take model over random data (heavy duplication, wild
  * magnitudes, tiny/huge brackets) with refinement knobs small enough
  * that every case exercises multiple narrowing rounds — the fp bucket
  * edges, the tie-dominated no-progress exit, and the monotone
  * data-derived-bounds argument all get fuzzed, not just unit-cased. */
object QuantilesProps extends Properties("Quantiles.exact") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  /** quantile_disc model: k-th smallest, k = max(1, ceil(p·n)). */
  private def model(vals: Seq[Long], p: Double): Long = {
    val s = vals.sorted
    s(math.max(1L, math.ceil(p * s.size).toLong).toInt - 1)
  }

  // duplication-heavy values across wild magnitudes (fp-edge bait: huge
  // ranges make bucket widths lose integer resolution early)
  private val genVals: Gen[List[Long]] =
    Gen.choose(1, 120).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-5L, 5L),
      Gen.choose(-1000000000000L, 1000000000000L),
      Gen.const(7L))))
  private val genProbs: Gen[List[Double]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.const(0.0), Gen.const(1.0), Gen.choose(0.0, 1.0))))

  property("exactQuantiles == sorted-take model (multi-round knobs)") =
    Prop.forAll(genVals, genProbs) { (vals, probs0) =>
      import spark.implicits._
      // dedupe permille collisions: the output is keyed by permille
      val probs = probs0.distinctBy(p => math.round(p * 1000)).sorted
      val got = Quantiles.exactQuantiles(vals.toDF("v"), col("v"), probs,
          buckets = 3, maxExact = 2)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      probs.forall(p =>
        got(math.round(p * 1000).toInt) == model(vals, p)) &&
        got.size == probs.size
    }

  property("exactQuantilesBy == per-group model, one call for all groups") =
    Prop.forAll(
      Gen.choose(1, 4).flatMap(g => Gen.listOfN(g, genVals)),
      genProbs) { (groups, probs0) =>
      import spark.implicits._
      val probs = probs0.distinctBy(p => math.round(p * 1000)).sorted
      val rows = groups.zipWithIndex.flatMap { case (vs, gi) =>
        vs.map(v => (s"g$gi", v))
      }
      val got = Quantiles.exactQuantilesBy(rows.toDF("g", "v"),
          col("g"), col("v"), probs, buckets = 3, maxExact = 2)
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      groups.zipWithIndex.forall { case (vs, gi) =>
        probs.forall(p =>
          got((s"g$gi", math.round(p * 1000).toInt)) == model(vs, p))
      } && got.size == groups.size * probs.size
    }
}
