package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the `nprobe` nearest centroid ids of a
  * vector under the dot-product metric — score descending, ascending-id
  * tiebreak — against a centroid matrix carried ON the expression node.
  *
  * Exists because the declarative formulation is O(nlist)-WIDE in the plan:
  * `greatest(struct(dot, -cl), …)` builds one struct column per centroid
  * (assignment) and `array_sort(array(struct(dot, cl), …))` one per probe,
  * where every `dot` is an `aggregate(zip_with(…))` higher-order function
  * over the full vector. At production nlist (≈√n ≈ 10⁴–10⁵ for a 100 TB
  * corpus) that means O(nlist) driver-side analysis per query, generated
  * methods past the 64 KB JVM limit (→ interpreted fallback of nlist HOF
  * evaluations per row), and constant-pool pressure. Here the matrix is ONE
  * reference object: the plan is a single node regardless of nlist, codegen
  * emits a constant-size call into [[NearestCentroids.topIds]] (a tight
  * primitive double loop, no per-row allocation beyond the k-slot result),
  * and the matrix ships to executors once per stage via the task binary —
  * the broadcast-centroids pattern with whole-stage codegen kept intact.
  *
  * Score arithmetic matches the HOF form bit-for-bit: each product is
  * `(double) vᵢ · cᵢ` (the float element widened exactly as Catalyst's
  * `Multiply(cast(float, double), double)`) accumulated left-to-right in a
  * double — so assignment and probe order are IDENTICAL to the expression
  * formulation they replace (property-pinned in PipelineSpec).
  *
  * Null contract: null vector → null; vector elements are assumed non-null
  * (inputs are embedding columns — same contract as [[LongArrayDot]]).
  * NaN scores rank last (the data contract excludes NaN embeddings).
  *
  * Result length is `min(nprobe, nlist)`; centroid ids are the matrix row
  * indices (callers order rows by cluster id — see
  * [[graft.pipeline.Similarity]]).
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]],
    nprobe: Int) extends UnaryExpression {

  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nprobe >= 1, "nprobe must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  // Row-major primitive matrix for the kernel; rebuilt lazily per JVM.
  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  // Element accessor width — resolved from the input type so float and
  // double embedding columns both take the exact widening the HOF form had.
  @transient private lazy val floatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"nearest_centroids expects array<float> or array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroids.topIds(input.asInstanceOf[ArrayData], mat, nprobe,
      floatInput)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val matRef = ctx.addReferenceObj("centroidMat", mat, "double[][]")
      s"${ev.value} = graft.functions.NearestCentroids.topIds(" +
        s"$v, $matRef, $nprobe, $floatInput);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroids = copy(child = newChild)
}

object NearestCentroids {

  /** The kernel shared by interpreted eval and generated code (called as a
    * static forwarder from codegen — one call site, constant code size):
    * dot-score every centroid row, keep the top `nprobe` by (score desc,
    * id asc) via a k-slot insertion list — O(nlist·(dim + nprobe)) per row,
    * zero allocation beyond the result. */
  def topIds(v: ArrayData, mat: Array[Array[Double]], nprobe: Int,
      floatInput: Boolean): ArrayData = {
    val nlist = mat.length
    val k = math.min(nprobe, nlist)
    val ids = new Array[Int](k)
    val scores = new Array[Double](k)
    var filled = 0
    var cl = 0
    while (cl < nlist) {
      val c = mat(cl)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0d
      var i = 0
      while (i < n) {
        acc += (if (floatInput) v.getFloat(i).toDouble else v.getDouble(i)) *
          c(i)
        i += 1
      }
      // Insert keeping (score desc, id asc): shifting only on STRICTLY
      // smaller existing scores means equal-score entries keep ascending-id
      // order (cl is visited ascending), and an equal-to-worst score never
      // evicts the smaller-id holder.
      if (filled < k) {
        var p = filled
        while (p > 0 && scores(p - 1) < acc) {
          scores(p) = scores(p - 1); ids(p) = ids(p - 1); p -= 1
        }
        scores(p) = acc; ids(p) = cl; filled += 1
      } else if (acc > scores(k - 1)) {
        var p = k - 1
        while (p > 0 && scores(p - 1) < acc) {
          scores(p) = scores(p - 1); ids(p) = ids(p - 1); p -= 1
        }
        scores(p) = acc; ids(p) = cl
      }
      cl += 1
    }
    new GenericArrayData(ids)
  }

  /** Column builder: `nprobe` nearest centroid row-indices of `vec`. */
  def nearest(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(vec), centroids, nprobe))
}
