package graft

import graft.functions.{DistinctShingleHashes, FloatCosine, LongArrayDot, MinHashAgg, NearestCentroids, SimHashAgg, VectorMeanAgg, WinnowHashes}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Config-driven extension entry point:
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) registers
  * EVERY native expression of the engine — scalar kernels and the sketch
  * aggregates — in each session created against the config: the standard
  * deployment path for a library shipping custom Catalyst expressions
  * (SURVEY.md §7.4). [[GraftExtensions.registerAll]] installs the same set
  * on an already-running session (used by the SQL-surface specs). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
        builder))
    }
    // SQL DML on graft catalog tables: DELETE FROM / UPDATE / MERGE INTO /
    // INSERT — resolved-plan rewrites into commit-producing commands
    // (see [[graft.sql.GraftDmlRule]]).
    ext.injectResolutionRule(new graft.sql.GraftDmlRule(_))
    // TIME TRAVEL resolves in the hint batch — before ResolveRelations
    // rejects commit-ts literals it cannot cast to TIMESTAMP
    ext.injectHintResolutionRule(new graft.sql.GraftTimeTravelRule(_))
    // ALTER TABLE DROP COLUMNS also in the hint batch — the session
    // catalog rejects V1 DROP COLUMNS during resolution, before custom
    // resolution rules would run
    ext.injectHintResolutionRule(new graft.sql.GraftAlterRule(_))
  }
}

object GraftExtensions {

  /** Evaluate a foldable argument to the Int literal the expression's
    * constructor needs (SQL surface passes widths/counts as literals).
    * Foldability is checked BEFORE eval so a non-constant argument fails
    * with this message, not an Unevaluable internal error. */
  private def litInt(e: Expression, what: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be an integer literal, got non-constant expression $e")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  /** Evaluate a foldable `array<array<double|float>>` argument to the
    * centroid matrix [[NearestCentroids]] carries on its node (the SQL
    * surface passes centroids as one array literal — constant-size plan).
    * Mirrors [[litInt]]: non-constant or null-containing input fails with
    * a clear message, not an Unevaluable/NullPointer internal error. */
  private def litMatrix(e: Expression): Seq[Seq[Double]] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"centroids must be an array literal, got non-constant expression $e")
    val rows = e.eval() match {
      case ad: ArrayData => ad
      case null => throw new IllegalArgumentException(
        "centroids must be a non-null array<array<double>> literal")
      case other => throw new IllegalArgumentException(
        s"centroids must be an array<array<double>> literal, got $other")
    }
    require((0 until rows.numElements()).forall(!rows.isNullAt(_)),
      "centroids matrix must not contain null rows")
    def noNullElems(row: ArrayData): ArrayData = {
      require((0 until row.numElements()).forall(!row.isNullAt(_)),
        "centroids matrix must not contain null elements")
      row
    }
    e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) =>
        rows.toObjectArray(ArrayType(DoubleType)).toSeq
          .map(r => noNullElems(r.asInstanceOf[ArrayData])
            .toDoubleArray().toSeq)
      case ArrayType(ArrayType(FloatType, _), _) =>
        rows.toObjectArray(ArrayType(FloatType)).toSeq
          .map(r => noNullElems(r.asInstanceOf[ArrayData])
            .toFloatArray().map(_.toDouble).toSeq)
      case other => throw new IllegalArgumentException(
        s"centroids must be array<array<double>> or array<array<float>>, " +
          s"got $other")
    }
  }

  /** name → builder for every native function (scalar + aggregate —
    * the analyzer wraps returned AggregateFunctions itself). */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "long_array_dot" ->
      ((cs: Seq[Expression]) => LongArrayDot(cs.head, cs(1))),
    "distinct_shingle_hashes" ->
      ((cs: Seq[Expression]) =>
        DistinctShingleHashes(cs.head, litInt(cs(1), "shingle width"))),
    "winnow_hashes" ->
      ((cs: Seq[Expression]) => WinnowHashes(cs.head,
        litInt(cs(1), "gram width"), litInt(cs(2), "window width"))),
    "minhash_sig" ->
      ((cs: Seq[Expression]) =>
        MinHashAgg(cs.head, litInt(cs(1), "numHashes"))),
    "simhash_bits" ->
      ((cs: Seq[Expression]) =>
        SimHashAgg(cs.head, litInt(cs(1), "bits"))),
    "nearest_centroids" ->
      ((cs: Seq[Expression]) =>
        NearestCentroids(cs.head, litMatrix(cs(1)), litInt(cs(2), "nprobe"))),
    "vector_mean" ->
      ((cs: Seq[Expression]) =>
        VectorMeanAgg(cs.head, litInt(cs(1), "dim"))),
    "float_cosine" ->
      ((cs: Seq[Expression]) => FloatCosine(cs.head, cs(1))),
    "sorted_intersect_count" ->
      ((cs: Seq[Expression]) =>
        graft.functions.SortedLongIntersectCount(cs.head, cs(1))),
    // exact mergeable distinct-count bitmaps (functions/BitmapDistinct)
    "bitmap_build" ->
      ((cs: Seq[Expression]) => graft.functions.BitmapBuildAgg(cs.head)),
    "bitmap_merge" ->
      ((cs: Seq[Expression]) => graft.functions.BitmapMergeAgg(cs.head)),
    "bitmap_union" ->
      ((cs: Seq[Expression]) =>
        graft.functions.BitmapUnion(cs.head, cs(1))),
    "bitmap_and" ->
      ((cs: Seq[Expression]) =>
        graft.functions.BitmapAnd(cs.head, cs(1))),
    "bitmap_andnot" ->
      ((cs: Seq[Expression]) =>
        graft.functions.BitmapAndNot(cs.head, cs(1))),
    "bitmap_cardinality" ->
      ((cs: Seq[Expression]) => graft.functions.BitmapCardinality(cs.head)),
    "bitmap_contains" ->
      ((cs: Seq[Expression]) =>
        graft.functions.BitmapContains(cs.head, cs(1))))

  /** Install every native function on a live session. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
