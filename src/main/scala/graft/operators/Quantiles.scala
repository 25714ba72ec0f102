package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles by iterative histogram refinement — no
  * global sort, no per-group value buffering.
  *
  * Rank contract (matches DuckDB's `quantile_disc`): the p-quantile of n
  * non-null rows is the k-th smallest value (1-based, duplicates counted)
  * with k = max(1, ceil(p·n)).
  *
  * Why not the obvious alternatives at 100 TB:
  *  - `ORDER BY` + take(k): a full range-shuffle sort of every row.
  *  - Spark's exact `percentile` aggregate: buffers a count-map of every
  *    DISTINCT value per group — OOMs on high-cardinality columns.
  *  - `approx_percentile`: bounded memory, but approximate.
  *
  * This operator: one stats pass (n, min, max), then per requested prob a
  * bracket [lo, hi] is narrowed by one B-bucket histogram per round — a
  * map-side-combined aggregate whose shuffle is ≤ B rows — until the
  * bracket holds ≤ `maxExact` rows; those aggregate per DISTINCT value and
  * the exact rank is picked on the driver. Rounds ≈ ⌈log_B(n/maxExact)⌉:
  * n = 10¹², B = 1024, maxExact = 10⁵ → 3 counting rounds, each
  * metadata-sized.
  *
  * fp-edge honesty: the `floor((v−lo)/width·B)` bucket index and the
  * derived range bounds are different fp arithmetic and can disagree by an
  * ulp at bucket edges, so the histogram is used only as a HEURISTIC to
  * locate the target bucket; the bracket actually adopted is re-counted
  * with the very range predicate the next round (and the final exact
  * stage) filters by, and widens a bucket per side until it provably
  * contains the target rank. Brackets are on the DOUBLE cast (cast is
  * order-monotone — earlier brackets hold strictly-smaller values, ties
  * share a bracket); the final selection compares ORIGINAL values, so the
  * result is exact for any ordered numeric type regardless of double
  * rounding. */
object Quantiles {

  /** One row per requested probability: (p_permille, value), where value
    * is the exact discrete quantile of `value` over `df`'s non-null rows,
    * in the column's own type. Empty input → empty result. */
  def exactQuantiles(df: DataFrame, value: Column, probs: Seq[Double],
      buckets: Int = 1024, maxExact: Int = 100000): DataFrame = {
    require(probs.nonEmpty, "at least one probability required")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0, 1]: $probs")
    require(buckets >= 2, s"need >= 2 histogram buckets (got $buckets)")
    val spark = df.sparkSession
    val base = graft.util.ParallelScan.widen(df.select(value.as("__v")))
      .filter(col("__v").isNotNull)
    val valueType = base.schema("__v").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p_permille",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("value", valueType)))

    val stats = base.agg(count(lit(1)).as("n"),
      min(col("__v").cast("double")).as("lo"),
      max(col("__v").cast("double")).as("hi")).collect()(0)
    val n = stats.getLong(0)
    if (n == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val (gLo, gHi) = (stats.getDouble(1), stats.getDouble(2))
    val vd = col("__v").cast("double")

    def answerFor(p: Double): Any = {
      var rank = math.max(1L, math.ceil(p * n).toLong)
      var lo = gLo
      var hi = gHi
      var cnt = n
      var progress = true
      while (cnt > maxExact && lo < hi && progress) {
        val width = hi - lo
        val idx = least(
          floor((vd - lit(lo)) / lit(width) * lit(buckets)).cast("int"),
          lit(buckets - 1))
        val histo = base.filter(vd >= lit(lo) && vd <= lit(hi))
          .groupBy(idx.as("__b")).agg(count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        var cum = 0L
        var i = 0
        while (i < buckets - 1 && cum + histo.getOrElse(i, 0L) < rank) {
          cum += histo.getOrElse(i, 0L); i += 1
        }
        // Adopt [newLo, newHi] only once the RANGE predicate itself proves
        // it contains the target rank; widen a bucket per side per retry
        // to absorb any fp disagreement with the floor-index heuristic.
        var widen = 0
        var done = false
        var newLo = lo; var newHi = hi
        var below = 0L; var inside = 0L
        while (!done) {
          newLo = if (i - widen <= 0) lo
            else lo + width * (i - widen).toDouble / buckets
          newHi = if (i + 1 + widen >= buckets) hi
            else lo + width * (i + 1 + widen).toDouble / buckets
          val chk = base.filter(vd >= lit(lo) && vd <= lit(hi)).agg(
            sum(when(vd < lit(newLo), 1L).otherwise(0L)).as("below"),
            sum(when(vd >= lit(newLo) && vd <= lit(newHi), 1L)
              .otherwise(0L)).as("inside")).collect()(0)
          below = if (chk.isNullAt(0)) 0L else chk.getLong(0)
          inside = if (chk.isNullAt(1)) 0L else chk.getLong(1)
          if (below < rank && rank <= below + inside) done = true
          else widen += 1
        }
        progress = newLo > lo || newHi < hi
        rank -= below
        cnt = inside
        lo = newLo
        hi = newHi
      }
      // Exact stage: aggregate per DISTINCT original value inside the
      // bracket (collect is bounded by distinct values ≤ cnt ≤ maxExact;
      // a tie-dominated no-progress bracket is ulp-wide, so its distinct
      // count is tiny even when its row count is not) and walk to the
      // rank-th smallest in original-type order.
      val grouped = base.filter(vd >= lit(lo) && vd <= lit(hi))
        .groupBy(col("__v")).agg(count(lit(1)).as("c"))
        .orderBy(col("__v").asc)
        .collect()
      var cum = 0L
      var ans: Any = null
      var j = 0
      while (ans == null && j < grouped.length) {
        cum += grouped(j).getLong(1)
        if (cum >= rank) ans = grouped(j).get(0)
        j += 1
      }
      require(ans != null,
        s"internal: rank $rank not found in bracket [$lo, $hi]")
      ans
    }

    val rows = probs.map { p =>
      org.apache.spark.sql.Row(math.round(p * 1000).toInt, answerFor(p))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
