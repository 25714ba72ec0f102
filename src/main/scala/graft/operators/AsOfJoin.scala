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
  * 100 TB. Skewed keys cost one sorted partition each; AQE skew handling
  * does not split window partitions, so pathological single keys should be
  * pre-bucketed by coarse time range if they arise.
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
    *                plan with the time axis reversed. */
  def asOf(left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightPayload: Seq[(String, Column)],
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)
    val l = left.select(
      struct(leftCols.map(col): _*).as("__row"),
      leftKey.as("__k"), leftTs.as("__ts"),
      lit(1).as("__side"), lit(null).cast(
        right.select(payloadStruct).schema.head.dataType).as("__p"))
    val r = right.select(
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema
        .head.dataType).as("__row"),
      rightKey.as("__k"), rightTs.as("__ts"),
      lit(0).as("__side"), payloadStruct.as("__p"))
    // Right rows (side 0) sort before left rows at equal ts in BOTH
    // directions, giving inclusive (≤ / ≥) semantics.
    val w = Window.partitionBy("__k")
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val outCols = leftCols.map(c => col(s"__row.$c").as(c)) ++
      rightPayload.map { case (n, _) => col(s"__asof.$n").as(n) }
    carried.select(outCols: _*)
  }
}
