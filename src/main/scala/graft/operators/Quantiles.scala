package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles by iterative histogram refinement — no
  * global sort, no per-group value buffering.
  *
  * Rank contract (matches DuckDB's `quantile_disc`): the p-quantile of n
  * non-null rows is the k-th smallest value (1-based, duplicates counted)
  * with k = max(1, ceil(p·n)). Ordering follows Spark SQL's fp total
  * order: −Inf < finite < +Inf < NaN.
  *
  * Why not the obvious alternatives at 100 TB:
  *  - `ORDER BY` + take(k): a full range-shuffle sort of every row.
  *  - Spark's exact `percentile` aggregate: buffers a count-map of every
  *    DISTINCT value per group — OOMs on high-cardinality columns.
  *  - `approx_percentile`: bounded memory, but approximate.
  *
  * This operator: one stats pass (n, min, max, non-finite band counts),
  * then per requested prob a bracket [lo, hi] is narrowed by one B-bucket
  * histogram per round — a map-side-combined aggregate whose shuffle is
  * ≤ B rows — until the bracket holds ≤ `maxExact` rows; those aggregate
  * per DISTINCT value and the exact rank is picked. Rounds ≈
  * ⌈log_B(n/maxExact)⌉: n = 10¹², B = 1024, maxExact = 10⁵ → 3 counting
  * rounds, each metadata-sized.
  *
  * Non-finite honesty: ±Inf and NaN rows would break the refinement's
  * memory bound (every row lands in bucket 0 when width is non-finite, so
  * the "no-progress brackets are ulp-wide" argument no longer caps the
  * exact stage). The stats pass therefore counts the −Inf / +Inf / NaN
  * BANDS exactly; a rank falling in a band is answered directly and only
  * ranks in the finite band (shifted by the −Inf count) enter refinement,
  * whose brackets are always finite. A finite bracket can still span more
  * than Double.MaxValue (width overflows to +Inf) — bucket indices then
  * use HALVED arithmetic, floor((v/2 − lo/2)/(hi/2 − lo/2)·B): x/2 is
  * order-monotone (equal doubles stay equal), which is all the bucket
  * index needs (see below), and hi/2 − lo/2 cannot overflow.
  *
  * fp-edge honesty: the `floor((v−lo)/width·B)` bucket index and
  * arithmetic bounds like `lo + width·i/B` are DIFFERENT fp expressions
  * and can disagree by an ulp at bucket edges — so the next bracket is
  * never an arithmetic bound. Instead the histogram reports each
  * bucket's actual (count, min vd, max vd); the bucket index is MONOTONE
  * in vd (equal doubles always share a bucket), so buckets are
  * contiguous runs of the sorted values and the rows with
  * vd ∈ [bucket min, bucket max] are EXACTLY that bucket's rows — the
  * data-derived bounds are an exact sub-bracket with nothing to
  * re-verify. Brackets live on the order-monotone double cast; the final
  * selection compares ORIGINAL values, so the result is exact for any
  * ordered numeric type regardless of double rounding. */
object Quantiles {

  private def requireProbs(probs: Seq[Double], buckets: Int): Unit = {
    require(probs.nonEmpty, "at least one probability required")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0, 1]: $probs")
    // output rows are keyed by round(p·1000) — two probs landing on the
    // same permille would emit ambiguous duplicate keys
    require(probs.map(p => math.round(p * 1000)).distinct.size == probs.size,
      s"probabilities must map to distinct permilles: $probs")
    require(buckets >= 2, s"need >= 2 histogram buckets (got $buckets)")
  }

  /** The non-finite value of the column's own fp type (bands can only be
    * non-empty for float/double columns — no other type casts to ±Inf or
    * NaN). */
  private def fpConst(valueType: org.apache.spark.sql.types.DataType,
      v: Double): Any = valueType match {
    case org.apache.spark.sql.types.FloatType => v.toFloat
    case org.apache.spark.sql.types.DoubleType => v
    case t => throw new IllegalStateException(
      s"internal: non-finite band on non-fp column type $t")
  }

  /** One row per requested probability: (p_permille, value), where value
    * is the exact discrete quantile of `value` over `df`'s non-null rows,
    * in the column's own type. Empty input → empty result.
    *
    * r18 (guide §2.4 — share one exchange per refinement round): the
    * former single-column path ran one histogram JOB per (prob, bracket)
    * per round — memoized only while the probs' brackets coincided — plus
    * one exact-stage job per prob; after round 1 the brackets diverge and
    * each round cost up to |probs| scans of the persisted base. The
    * grouped engine ([[exactQuantilesBy]]) already advances EVERY active
    * bracket in ONE aggregate job per round (broadcast bracket table,
    * in-frame rank walk) and resolves all exact stages in one job, so the
    * single-column operator delegates with a constant group: pass count
    * becomes the deepest prob's ⌈log_B⌉ with exactly one base scan each.
    * Rank contract, fp band routing and the bucket-index arithmetic are
    * the shared implementation's — results identical (pinned against the
    * sorted-take model in QuantilesProps). */
  def exactQuantiles(df: DataFrame, value: Column, probs: Seq[Double],
      buckets: Int = 1024, maxExact: Int = 100000): DataFrame =
    exactQuantilesBy(df, lit(1), value, probs, buckets, maxExact)
      .select(col("p_permille"), col("value"))

  /** Per-GROUP exact quantiles — the same rank contract, band routing,
    * and histogram-refinement shape as [[exactQuantiles]], with EVERY
    * (group, prob) bracket advanced together: each round is ONE
    * aggregate job keyed (group, prob, bucket) over a broadcast table of
    * the active brackets, so the pass count is the DEEPEST group's
    * ⌈log_B(rows/maxExact)⌉ — never the group count. The walk to the
    * rank-holding bucket happens IN THE FRAME (a running-sum window per
    * (group, prob) partition over the ≤ B histogram rows, filtered to
    * the one bucket whose cumulative range covers the rank), so each
    * round collects exactly ONE row per active (group, prob) — driver
    * state is O(groups × probs), which per-group quantile semantics
    * require anyway (one answer row per group × prob), never
    * × buckets and never × maxExact. The exact stage is resolved the
    * same way: per-distinct-value counts stay distributed and only the
    * rank-holding value row per (group, prob) is collected. Output:
    * (grp, p_permille, value) in the group and value columns' own
    * types. */
  def exactQuantilesBy(df: DataFrame, group: Column, value: Column,
      probs: Seq[Double], buckets: Int = 1024,
      maxExact: Int = 100000): DataFrame = {
    requireProbs(probs, buckets)
    val spark = df.sparkSession
    val base = graft.util.ParallelScan.widen(
        df.select(group.as("__g"), value.as("__v")))
      .filter(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val grpType = base.schema("__g").dataType
    val valueType = base.schema("__v").dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp", grpType),
      org.apache.spark.sql.types.StructField("p_permille",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("value", valueType)))
    val vd = col("__v").cast("double")

    final case class St(grp: Any, pi: Int, var rank: Long, var lo: Double,
      var hi: Double, var cnt: Long, var stuck: Boolean = false,
      var ans: Any = null)
    val stats = base.groupBy(col("__g")).agg(count(lit(1)).as("n"),
      count(when(vd === lit(Double.NegativeInfinity), 1)).as("nneg"),
      count(when(vd === lit(Double.PositiveInfinity), 1)).as("npos"),
      count(when(isnan(vd), 1)).as("nnan"),
      min(when(!isnan(vd) && vd > lit(Double.NegativeInfinity) &&
        vd < lit(Double.PositiveInfinity), vd)).as("lo"),
      max(when(!isnan(vd) && vd > lit(Double.NegativeInfinity) &&
        vd < lit(Double.PositiveInfinity), vd)).as("hi")).collect()
    val states = stats.flatMap { r =>
      val n = r.getLong(1)
      val (nNeg, nPos, nNan) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val nFin = n - nNeg - nPos - nNan
      probs.zipWithIndex.map { case (p, pi) =>
        val rank0 = math.max(1L, math.ceil(p * n).toLong)
        val s =
          if (rank0 <= nNeg)
            St(r.get(0), pi, 0L, 0.0, 0.0, 0L,
              ans = fpConst(valueType, Double.NegativeInfinity))
          else if (rank0 > nNeg + nFin && rank0 <= nNeg + nFin + nPos)
            St(r.get(0), pi, 0L, 0.0, 0.0, 0L,
              ans = fpConst(valueType, Double.PositiveInfinity))
          else if (rank0 > nNeg + nFin + nPos)
            St(r.get(0), pi, 0L, 0.0, 0.0, 0L,
              ans = fpConst(valueType, Double.NaN))
          else
            St(r.get(0), pi, rank0 - nNeg, r.getDouble(5), r.getDouble(6),
              nFin)
        s
      }
    }.toSeq
    def needsRound(s: St) = s.ans == null && s.cnt > maxExact &&
      s.lo < s.hi && !s.stuck
    val bracketSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__bg", grpType),
      org.apache.spark.sql.types.StructField("__pi",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__rank",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__lo",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("__hi",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    def bracketsDf(ss: Seq[St]) = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(ss.map(s =>
        org.apache.spark.sql.Row(s.grp, s.pi, s.rank, s.lo, s.hi)),
        math.max(1, ss.size / 10000)),
      bracketSchema))
    def joined(ss: Seq[St]) = base.join(bracketsDf(ss),
      col("__g") <=> col("__bg") && vd >= col("__lo") && vd <= col("__hi"))
    // Per-bracket bucket index with per-row overflow fallback: when a
    // bracket's width overflows to +Inf the HALVED form is used for that
    // bracket's rows (same monotonicity argument as the single-column
    // path — x/2 is order-monotone, hi/2 − lo/2 never overflows).
    val width = col("__hi") - col("__lo")
    val halved = floor((vd / 2 - col("__lo") / 2) /
      (col("__hi") / 2 - col("__lo") / 2) * lit(buckets))
    val plain = floor((vd - col("__lo")) / width * lit(buckets))
    val idx = least(
      when(width === lit(Double.PositiveInfinity), halved)
        .otherwise(plain).cast("int"),
      lit(buckets - 1))

    while (states.exists(needsRound)) {
      val active = states.filter(needsRound)
      // Bucket histogram per active bracket, then the rank walk IN THE
      // FRAME: a running-sum window over each (group, prob)'s ≤ B bucket
      // rows picks the single bucket whose cumulative count range covers
      // the rank — one collected row per active state, never × buckets.
      val hw = Window.partitionBy(col("g"), col("__pi"))
        .orderBy(col("__b"))
      val picked = joined(active)
        .groupBy(col("__g").as("g"), col("__pi"), col("__rank"),
          idx.as("__b"))
        .agg(count(lit(1)).as("c"), min(vd).as("mn"), max(vd).as("mx"))
        .withColumn("cumx", coalesce(
          sum(col("c")).over(hw.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .filter(col("__rank") > col("cumx") &&
          col("__rank") <= col("cumx") + col("c"))
        .select(col("g"), col("__pi"), col("c"), col("mn"), col("mx"),
          col("cumx"))
        .collect()
        .map(r => (r.get(0), r.getInt(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
        .toMap
      active.foreach { s =>
        val (bCnt, bMin, bMax, cumx) = picked.getOrElse((s.grp, s.pi),
          throw new IllegalStateException(
            s"internal: group ${s.grp} rank ${s.rank} not covered in " +
              s"bracket [${s.lo}, ${s.hi}]"))
        s.stuck = !(bMin > s.lo || bMax < s.hi)
        s.rank -= cumx
        s.cnt = bCnt
        s.lo = bMin
        s.hi = bMax
      }
    }
    // Exact stage, ALL remaining states in one job: per-distinct-value
    // counts inside each final bracket, the rank-holding value picked by
    // the same in-frame running-sum window — one collected row per
    // (group, prob), never × maxExact.
    val pending = states.filter(_.ans == null)
    if (pending.nonEmpty) {
      val vw = Window.partitionBy(col("g"), col("__pi"))
        .orderBy(col("__v").asc)
      val resolved = joined(pending)
        .groupBy(col("__g").as("g"), col("__pi"), col("__rank"), col("__v"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cumx", coalesce(
          sum(col("c")).over(vw.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .filter(col("__rank") > col("cumx") &&
          col("__rank") <= col("cumx") + col("c"))
        .select(col("g"), col("__pi"), col("__v"))
        .collect()
        .map(r => (r.get(0), r.getInt(1)) -> r.get(2))
        .toMap
      pending.foreach { s =>
        s.ans = resolved.getOrElse((s.grp, s.pi),
          throw new IllegalStateException(
            s"internal: group ${s.grp} rank ${s.rank} not found in " +
              s"bracket [${s.lo}, ${s.hi}]"))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(states.map(s =>
        org.apache.spark.sql.Row(s.grp,
          math.round(probs(s.pi) * 1000).toInt, s.ans)), 1),
      outSchema)
    } finally base.unpersist()
  }
}
