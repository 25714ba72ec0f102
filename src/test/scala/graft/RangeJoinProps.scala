package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check: RangeJoin.countPreceding over random inputs must
  * equal the obvious in-memory model (per left row: count of right rows
  * with same key and ts in [lts - window, lts)). */
object RangeJoinProps extends Properties("RangeJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genRow: Gen[(Long, Long)] = for {
    k <- Gen.choose(0L, 3L)
    ts <- Gen.choose(0L, 40L)
  } yield (k, ts)

  private val genInput = for {
    l <- Gen.listOfN(10, genRow)
    r <- Gen.listOfN(20, genRow)
    w <- Gen.choose(1L, 15L)
  } yield (l.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }, r, w)

  property("equals the in-memory band-count model") =
    Prop.forAll(genInput) { case (leftRows, rightRows, window) =>
      import spark.implicits._
      val left = leftRows.toDF("event_id", "key", "ts")
      val right = rightRows.toDF("key", "ts")

      val got = RangeJoin.countPreceding(left, col("event_id"), col("key"),
          col("ts"), right, col("key"), col("ts"), window)
        .select("id", "n_matches").as[(Long, Long)].collect().toMap

      val want = leftRows.map { case (id, k, ts) =>
        id -> rightRows.count { case (rk, rts) =>
          rk == k && rts >= ts - window && rts < ts
        }.toLong
      }.toMap

      got == want
    }

  property("following window equals the in-memory model") =
    Prop.forAll(genInput) { case (leftRows, rightRows, window) =>
      import spark.implicits._
      val left = leftRows.toDF("event_id", "key", "ts")
      val right = rightRows.toDF("key", "ts")

      val got = RangeJoin.countFollowing(left, col("event_id"), col("key"),
          col("ts"), right, col("key"), col("ts"), window)
        .select("id", "n_matches").as[(Long, Long)].collect().toMap

      val want = leftRows.map { case (id, k, ts) =>
        id -> rightRows.count { case (rk, rts) =>
          rk == k && rts > ts && rts <= ts + window
        }.toLong
      }.toMap

      got == want
    }
}
