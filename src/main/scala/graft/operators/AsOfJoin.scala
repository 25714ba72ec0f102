package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * LATEST right row with the same key and `rightTs <= leftTs` (inclusive),
  * or nulls when no such row exists.
  *
  * Spark-first implementation: both sides are unioned into one stream,
  * shuffled ONCE by key, and sorted by (ts, side) within each key; a
  * running `last(payload, ignoreNulls)` window carries the most recent
  * right payload forward onto every left row. Right rows sort BEFORE left
  * rows at equal timestamps, giving ≤ semantics.
  *
  * Scale: this is the merge-sort formulation — cost is one shuffle + one
  * sort of |L|+|R| rows, independent of time-gap width. The naive
  * range-join (`l.key = r.key AND r.ts <= l.ts` + max-per-left) explodes to
  * O(|L|·|R|) per key before aggregation and is never competitive at
  * 100 TB.
  *
  * Skew: AQE cannot split window partitions, so a pathological hot key
  * (one key carrying a large fraction of all rows) serializes into a
  * single sorted partition. `bucketWidth = Some(w)` activates the EXACT
  * time-bucketed fallback: rows are windowed by (key, ⌊ts/w⌋) instead of
  * (key) — the hot key's timeline splits into parallel, independently
  * sorted buckets — and correctness is restored by injecting one synthetic
  * "carry-in" right row per (key, bucket) holding the boundary state (the
  * latest right payload before the bucket starts; earliest after it ends
  * in forward mode). Bucketed mode requires integral timestamps and is
  * plan-equal to the default for every input (property-pinned in
  * AsOfJoinProps).
  *
  * Determinism contract: callers must ensure at most one right row per
  * (key, ts) — e.g. pre-aggregate the right side — otherwise the carried
  * payload among equal-ts right rows is sort-order dependent.
  */
object AsOfJoin {

  /** @param rightPayload (outputName -> column-of-right) payload attached
    *                     to each left row (null when no matching right row).
    * @param forward false (default): LATEST right row with rightTs ≤ leftTs
    *                (backward as-of). true: EARLIEST right row with
    *                rightTs ≥ leftTs (forward as-of) — the same merge-sort
    *                plan with the time axis reversed.
    * @param bucketWidth Some(w): exact skew fallback — window by
    *                (key, ⌊ts/w⌋) with per-bucket boundary carry-in, so a
    *                hot key parallelizes across ceil(range/w) partitions.
    *                Requires integral ts. None (default): one window
    *                partition per key. */
  def asOf(left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightPayload: Seq[(String, Column)],
      forward: Boolean = false,
      bucketWidth: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)
    val pType = right.select(payloadStruct).schema.head.dataType
    val rowType = left.select(struct(leftCols.map(col): _*))
      .schema.head.dataType
    val l = left.select(
      struct(leftCols.map(col): _*).as("__row"),
      leftKey.as("__k"), leftTs.as("__ts"),
      lit(1).as("__side"), lit(null).cast(pType).as("__p"))
    val r = right.select(
      lit(null).cast(rowType).as("__row"),
      rightKey.as("__k"), rightTs.as("__ts"),
      lit(0).as("__side"), payloadStruct.as("__p"))

    def project(carried: DataFrame): DataFrame = {
      val outCols = leftCols.map(c => col(s"__row.$c").as(c)) ++
        rightPayload.map { case (n, _) => col(s"__asof.$n").as(n) }
      carried.filter(col("__side") === 1).select(outCols: _*)
    }

    bucketWidth match {
      case None =>
        // Right rows (side 0) sort before left rows at equal ts in BOTH
        // directions, giving inclusive (≤ / ≥) semantics.
        val w = Window.partitionBy("__k")
          .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
            col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        project(r.unionByName(l)
          .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w)))

      case Some(w0) =>
        require(w0 > 0, "bucketWidth must be positive")
        // Bucketed mode orders by the long-cast __ts; with fractional ts
        // (double/timestamp) truncation would silently flip inclusive
        // semantics vs the default plan — reject non-integral ts up front.
        locally {
          import org.apache.spark.sql.types._
          Seq(l, r).foreach { df =>
            val t = df.schema("__ts").dataType
            require(Set[DataType](ByteType, ShortType, IntegerType, LongType)
                .contains(t),
              s"bucketed as-of requires an integral timestamp column " +
                s"(byte/short/int/long), got $t — use the default " +
                "(bucketWidth=None) plan or pre-scale the ts to integers")
          }
        }
        // Floor-division bucket (sign-correct, pure integer arithmetic —
        // no double rounding at epoch-scale timestamps).
        def bucketed(df: DataFrame): DataFrame = df
          .withColumn("__ts", col("__ts").cast("long"))
          .withColumn("__b",
            expr(s"(__ts - ((__ts % $w0 + $w0) % $w0)) div $w0"))
        val lb = bucketed(l)
        val rb = bucketed(r)
        // Boundary state contributed by each (key, bucket): the bucket's
        // last right payload (first in forward mode). ≤1 right row per
        // (key, ts) makes max_by/min_by deterministic.
        val perBucket = rb.groupBy("__k", "__b").agg(
          (if (forward) min_by(col("__p"), col("__ts"))
           else max_by(col("__p"), col("__ts"))).as("__bp"))
        // Spine = every (key, bucket) either side occupies; the carry-in for
        // a bucket is the nearest OTHER-bucket boundary state strictly
        // before it (after, in forward mode). Window rows are per-bucket —
        // metadata-sized relative to the data (|spine| ≤ |L|+|R| buckets).
        val spine = lb.select("__k", "__b").union(rb.select("__k", "__b"))
          .distinct()
        val wCarry = Window.partitionBy("__k")
          .orderBy(if (forward) col("__b").desc else col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val synthetic = spine
          .join(perBucket, Seq("__k", "__b"), "left")
          .withColumn("__carry",
            last(col("__bp"), ignoreNulls = true).over(wCarry))
          .filter(col("__carry").isNotNull)
          .select(
            lit(null).cast(rowType).as("__row"),
            col("__k"),
            // Bucket-boundary timestamp: ≤ (≥) every real ts in the bucket;
            // side −1 sorts the carry-in before any real row tied with it.
            (if (forward) (col("__b") + 1) * w0 - 1
             else col("__b") * w0).as("__ts"),
            lit(-1).as("__side"),
            col("__carry").as("__p"),
            col("__b"))
        val wIn = Window.partitionBy("__k", "__b")
          .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
            col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        project(rb.unionByName(lb).unionByName(synthetic)
          .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(wIn)))
    }
  }
}
