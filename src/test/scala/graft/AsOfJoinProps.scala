package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property-based check: AsOfJoin over random inputs must equal the obvious
  * in-memory model (per left row: the max-ts right row with same key and
  * ts ≤ left ts). Right side is generated unique per (key, ts), matching the
  * operator's determinism contract. */
object AsOfJoinProps extends Properties("AsOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genRow: Gen[(Long, Long)] = for {
    k <- Gen.choose(0L, 3L)
    ts <- Gen.choose(0L, 20L)
  } yield (k, ts)

  private val genInput: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      l <- Gen.listOfN(12, genRow)
      r <- Gen.listOfN(12, genRow)
    } yield (
      l.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) },
      r.distinctBy { case (k, ts) => (k, ts) }
        .zipWithIndex.map { case ((k, ts), i) => (k, ts, 100L + i) })

  property("equals the in-memory point-in-time model") =
    Prop.forAll(genInput) { case (leftRows, rightRows) =>
      import spark.implicits._
      val left = leftRows.toDF("event_id", "key", "ts")
      val right = rightRows.toDF("key", "ts", "payload")

      val got = AsOfJoin.asOf(left, col("key"), col("ts"),
          right, col("key"), col("ts"),
          Seq("payload" -> col("payload")))
        .select("event_id", "payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some(r.getLong(1)))).toMap

      val want = leftRows.map { case (id, k, ts) =>
        val cand = rightRows.filter { case (rk, rts, _) => rk == k && rts <= ts }
        id -> cand.sortBy(_._2).lastOption.map(_._3)
      }.toMap

      got == want
    }

  property("forward direction equals the earliest-at-or-after model") =
    Prop.forAll(genInput) { case (leftRows, rightRows) =>
      import spark.implicits._
      val left = leftRows.toDF("event_id", "key", "ts")
      val right = rightRows.toDF("key", "ts", "payload")

      val got = AsOfJoin.asOf(left, col("key"), col("ts"),
          right, col("key"), col("ts"),
          Seq("payload" -> col("payload")), forward = true)
        .select("event_id", "payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some(r.getLong(1)))).toMap

      val want = leftRows.map { case (id, k, ts) =>
        val cand = rightRows.filter { case (rk, rts, _) => rk == k && rts >= ts }
        id -> cand.sortBy(_._2).headOption.map(_._3)
      }.toMap

      got == want
    }

  /** Single hot key (the exact skew shape bucketed mode exists for): the
    * time-bucketed plan must equal the single-window plan for every width
    * and both directions. */
  private val genSkewInput: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      lts <- Gen.listOfN(15, Gen.choose(0L, 30L))
      rts <- Gen.listOfN(15, Gen.choose(0L, 30L))
    } yield (
      lts.zipWithIndex.map { case (ts, i) => (i.toLong, 0L, ts) },
      rts.distinct.zipWithIndex.map { case (ts, i) => (0L, ts, 100L + i) })

  property("bucketed skew mode equals the single-window plan") =
    Prop.forAll(genSkewInput, Gen.oneOf(1L, 2L, 5L, 7L, 100L),
        Gen.oneOf(true, false)) { case ((leftRows, rightRows), w, fwd) =>
      import spark.implicits._
      val left = leftRows.toDF("event_id", "key", "ts")
      val right = rightRows.toDF("key", "ts", "payload")
      def run(width: Option[Long]) =
        AsOfJoin.asOf(left, col("key"), col("ts"),
            right, col("key"), col("ts"),
            Seq("payload" -> col("payload")), forward = fwd,
            bucketWidth = width)
          .select("event_id", "payload").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
            else Some(r.getLong(1)))).toMap
      val bucketed = run(Some(w))
      val plain = run(None)
      (bucketed == plain) :| s"w=$w fwd=$fwd: $bucketed vs $plain"
    }

  /** Fractional timestamps under bucketed mode would order by the
    * long-CAST value and silently flip inclusive semantics — the operator
    * must reject them up front (the default plan accepts any orderable
    * ts). */
  property("bucketed mode rejects non-integral timestamp columns") =
    Prop.forAll(Gen.oneOf(true, false)) { fwd =>
      import spark.implicits._
      val left = Seq((1L, 1L, 5.2d)).toDF("event_id", "key", "ts")
      val right = Seq((1L, 5.7d, 9L)).toDF("key", "ts", "payload")
      val thrown =
        try {
          AsOfJoin.asOf(left, col("key"), col("ts"),
            right, col("key"), col("ts"),
            Seq("payload" -> col("payload")), forward = fwd,
            bucketWidth = Some(2L))
          false
        } catch { case _: IllegalArgumentException => true }
      thrown :| "double ts must be rejected in bucketed mode"
    }
}
