package graft

import graft.functions.{DistinctShingleHashes, LongArrayDot, MinHashAgg, NearestCentroids, SimHashAgg, WinnowHashes}
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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
        builder))
    }
}

object GraftExtensions {

  /** Evaluate a foldable argument to the Int literal the expression's
    * constructor needs (SQL surface passes widths/counts as literals). */
  private def litInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Evaluate a foldable `array<array<double|float>>` argument to the
    * centroid matrix [[NearestCentroids]] carries on its node (the SQL
    * surface passes centroids as one array literal — constant-size plan). */
  private def litMatrix(e: Expression): Seq[Seq[Double]] = {
    val rows = e.eval() match {
      case ad: ArrayData => ad
      case other => throw new IllegalArgumentException(
        s"centroids must be an array<array<double>> literal, got $other")
    }
    e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) =>
        rows.toObjectArray(ArrayType(DoubleType)).toSeq
          .map(_.asInstanceOf[ArrayData].toDoubleArray().toSeq)
      case ArrayType(ArrayType(FloatType, _), _) =>
        rows.toObjectArray(ArrayType(FloatType)).toSeq
          .map(_.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble).toSeq)
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
        NearestCentroids(cs.head, litMatrix(cs(1)), litInt(cs(2), "nprobe"))))

  /** Install every native function on a live session. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
