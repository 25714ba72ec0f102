package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-range (band) join: for each left row, aggregate the right rows
  * with the same key whose timestamp falls in `[leftTs - window, leftTs)` —
  * e.g. "clicks in the 10 minutes before each error".
  *
  * Spark-first formulation: both sides are bucketized by
  * `bucket(ts) = ts - (ts mod window)` (exact integer arithmetic — float
  * division of epoch-nanos would mis-bucket near boundaries). A right row
  * lands in ONE bucket; a left row's band `[lts - window, lts)` can only
  * intersect buckets `bucket(lts)` and `bucket(lts) - window`, so the left
  * side explodes to exactly two candidate buckets, the sides equi-join on
  * (key, bucket), and the exact range predicate prunes the band edges.
  *
  * Scale: shuffle volume is O(2·|L| + |R|) rows keyed by (key, bucket) —
  * never the O(|L|·|R|) of a naive inequality join; per-bucket fan-out is
  * bounded by the band width (data density per window), the natural unit of
  * skew. A pathological key×window hotspot shows up as one large bucket —
  * AQE skew-join splitting applies because this IS a plain equi-join.
  */
object RangeJoin {

  /** Count right matches per left row; left rows with no match keep 0.
    *
    * @param leftId unique left row id (carried through; output grain)
    * @param window band width in the ts unit (must be > 0)
    * @return left rows (id, key, ts) + `n_matches`
    */
  def countPreceding(left: DataFrame, leftId: Column, leftKey: Column,
      leftTs: Column, right: DataFrame, rightKey: Column, rightTs: Column,
      window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    def bucket(ts: Column): Column = ts - pmod(ts, lit(window))
    val l = left.select(leftId.as("id"), leftKey.as("k"),
      leftTs.cast("long").as("ts"))
    val lCand = l.withColumn("b",
      explode(array_distinct(array(bucket(col("ts")),
        bucket(col("ts")) - window))))
    val r = right.select(rightKey.as("k"), rightTs.cast("long").as("rts"))
      .withColumn("b", bucket(col("rts")))
    val counts = lCand.join(r, Seq("k", "b"))
      .filter(col("rts") >= col("ts") - window && col("rts") < col("ts"))
      .groupBy("id").agg(count(lit(1)).as("n_matches"))
    l.join(counts, Seq("id"), "left_outer")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
  }

  /** Mirror of [[countPreceding]] for the FOLLOWING band `(leftTs,
    * leftTs + window]` — e.g. "clicks in the 10 minutes after each error".
    * Candidate buckets: `bucket(lts)` and `bucket(lts) + window`. */
  def countFollowing(left: DataFrame, leftId: Column, leftKey: Column,
      leftTs: Column, right: DataFrame, rightKey: Column, rightTs: Column,
      window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    def bucket(ts: Column): Column = ts - pmod(ts, lit(window))
    val l = left.select(leftId.as("id"), leftKey.as("k"),
      leftTs.cast("long").as("ts"))
    val lCand = l.withColumn("b",
      explode(array_distinct(array(bucket(col("ts")),
        bucket(col("ts")) + window))))
    val r = right.select(rightKey.as("k"), rightTs.cast("long").as("rts"))
      .withColumn("b", bucket(col("rts")))
    val counts = lCand.join(r, Seq("k", "b"))
      .filter(col("rts") > col("ts") && col("rts") <= col("ts") + window)
      .groupBy("id").agg(count(lit(1)).as("n_matches"))
    l.join(counts, Seq("id"), "left_outer")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
  }
}
