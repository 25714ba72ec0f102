package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based checks: the sampling/mixture/quantile operators must
  * equal exact in-memory models — membership and ordering are pure
  * functions of (key, salt) via md5, so the model recomputes them with
  * `java.security.MessageDigest` and compares row-for-row. */
object CurationProps extends Properties("Curation.sampling") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def member(key: Long, salt: String, frac: Double): Boolean =
    frac >= 1.0 ||
      md5hex(s"$key|$salt").substring(0, 8) < Curation.hexBound(frac)

  private val genKeys: Gen[List[Long]] =
    Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 1000L)).map(_.distinct))
  private val genSalt: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(_.mkString)
  private val genFrac: Gen[Double] = Gen.oneOf(
    Gen.const(0.0), Gen.const(1.0), Gen.choose(0.01, 0.99))

  property("sampleByHash == the md5-prefix model") =
    Prop.forAll(genKeys, genSalt, genFrac) { (keys, salt, frac) =>
      import spark.implicits._
      val got = keys.toDF("k")
        .filter(Curation.sampleByHash(col("k"), salt, frac))
        .as[Long].collect().toSet
      got == keys.filter(member(_, salt, frac)).toSet
    }

  private val strata = Vector("en", "de", "fr")
  private val genRows: Gen[List[(Long, String)]] =
    Gen.choose(1, 50).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 500L), Gen.oneOf(strata))))
      .map(_.distinctBy(_._1))

  property("reservoir == sort-by-(hash,key)-take-k per stratum") =
    Prop.forAll(genRows, genSalt, Gen.choose(1, 5)) { (rows, salt, k) =>
      import spark.implicits._
      val got = Curation.reservoir(rows.toDF("id", "s"), col("s"),
          col("id"), salt, k)
        .select(col("id"), col("s"), col("sample_rank"))
        .as[(Long, String, Long)].collect().toSet
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (s, rs) =>
        rs.map(_._1).sortBy(id => (md5hex(s"$id|$salt"), id)).take(k)
          .zipWithIndex.map { case (id, i) => (id, s, (i + 1).toLong) }
      }.toSet
      got == expected
    }

  property("mixByBudget == the greedy hash-order fill model") =
    Prop.forAll(genRows, genSalt, Gen.choose(0L, 40L), Gen.choose(0L, 40L)) {
      (rows, salt, bEn, bDe) =>
        import spark.implicits._
        val withTok = rows.map { case (id, s) => (id, s, id % 7) }
        val budgets = Seq("en" -> bEn, "de" -> bDe) // fr unbudgeted -> drop
        val got = Curation.mixByBudget(withTok.toDF("id", "s", "n"),
            col("s"), col("id"), salt, col("n"), budgets)
          .select(col("id"), col("tok_before"))
          .as[(Long, Long)].collect().toSet
        val budget = budgets.toMap
        val expected = withTok.groupBy(_._2).toSeq.flatMap { case (s, rs) =>
          val b = budget.getOrElse(s, 0L)
          rs.sortBy { case (id, _, _) => (md5hex(s"$id|$salt"), id) }
            .scanLeft((0L, Option.empty[(Long, Long)])) {
              case ((cum, _), (id, _, n)) => (cum + n, Some((id, cum)))
            }
            .collect { case (_, Some((id, before))) if before < b =>
              (id, before) }
        }.toSet
        got == expected
    }

  property("keepTopQuantile == smallest-threshold-covering-ceil model") =
    Prop.forAll(genKeys, Gen.choose(0.01, 1.0)) { (keys, frac) =>
      import spark.implicits._
      val rows = keys.map(id => (id, id % 11)) // heavy score ties
      val got = Curation.keepTopQuantile(rows.toDF("id", "s"), col("s"),
          frac)
        .select(col("id")).as[Long].collect().toSet
      val target = math.ceil(frac * rows.size).toLong
      val thr = rows.map(_._2).distinct.sorted(Ordering[Long].reverse)
        .find(t => rows.count(_._2 >= t) >= target)
      val expected = thr.fold(Set.empty[Long])(t =>
        rows.filter(_._2 >= t).map(_._1).toSet)
      got == expected
    }
}
