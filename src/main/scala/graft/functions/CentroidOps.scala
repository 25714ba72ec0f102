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

/** Native Catalyst expression: a vector minus its ASSIGNED centroid —
  * the IVF residual the PQ codebooks quantize (`x − centroid(cell)`).
  *
  * Exists for the same reason as [[NearestCentroids]]: the declarative
  * form `zip_with(v, element_at(typedLit(centroids), cl + 1), _ - _)`
  * embeds the whole nlist×dim centroid table as an ANALYZED ARRAY
  * LITERAL in the plan — O(nlist·dim) analysis, constant-pool and
  * serialization cost per query, the exact shape the assignment path
  * already engineered away. Here the matrix is one reference object
  * shipped with the stage; the plan is a single node regardless of
  * nlist and the subtraction loop runs inside whole-stage codegen.
  *
  * Arithmetic matches the HOF form bit-for-bit: FLOAT subtraction per
  * element (`Subtract(FloatType)`), element order preserved. Null
  * contract: null vector or null cluster → null; a cluster id outside
  * the matrix → null (as `element_at` past the end). Inputs are the
  * encode paths' internal columns (array<float> vector, int cluster),
  * property-pinned equal to the HOF form in PipelineSpec. */
case class CentroidResidual(left: Expression, right: Expression,
    centroids: Seq[Seq[Float]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(centroids.nonEmpty, "centroids must be non-empty")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true // out-of-range cluster → null
  override def prettyName: String = "centroid_residual"

  @transient private lazy val mat: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(v: Any, cl: Any): Any =
    CentroidOps.residualAt(v.asInstanceOf[ArrayData], mat,
      cl.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cl) => {
      val matRef = ctx.addReferenceObj("centroidMatF", mat, "float[][]")
      s"""${ev.value} = graft.functions.CentroidOps.residualAt(
         |  $v, $matRef, $cl);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CentroidResidual =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: ⟨query, centroid(cell)⟩ — the residual
  * decomposition's per-(query, probed-cell) term in ADC scoring
  * (`⟨q, x̂⟩ = ⟨q, c_cell⟩ + ⟨q, r̂⟩`). Replaces the
  * `aggregate(zip_with(q, element_at(typedLit(cents), cl + 1), _*_))`
  * HOF form whose centroid literal is O(nlist·dim) in the analyzed
  * plan. Arithmetic bit-identical to the HOF form: each product is
  * `(double) qᵢ · cᵢ` accumulated left-to-right in a double. Null
  * vector/cluster or out-of-range cluster → null. */
case class CentroidQueryDot(left: Expression, right: Expression,
    centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(centroids.nonEmpty, "centroids must be non-empty")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // out-of-range cluster → null
  override def prettyName: String = "centroid_query_dot"

  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(v: Any, cl: Any): Any = {
    val c = cl.asInstanceOf[Int]
    if (c < 0 || c >= mat.length) null
    else java.lang.Double.valueOf(
      CentroidOps.dotAt(v.asInstanceOf[ArrayData], mat, c))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cl) => {
      val matRef = ctx.addReferenceObj("centroidMatD", mat, "double[][]")
      s"""if ($cl < 0 || $cl >= $matRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CentroidOps.dotAt(
         |    $v, $matRef, $cl);
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CentroidQueryDot =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: `M · x` — the dense mat-vec behind the
  * OPQ rotation and the PCA projection. Replaces the
  * `transform(typedLit(M), row => aggregate(zip_with(row, vec, _*_), 0d,
  * _+_))` HOF form, which (a) embeds the dim×dim matrix as an ANALYZED
  * ARRAY LITERAL per plan (4096 doubles at dim 64 — the cost class
  * [[NearestCentroids]]/[[CentroidResidual]] were built to kill) and
  * (b) evaluates interpreted with three lambda dispatches and a boxed
  * accumulator per element. Here the matrix ships as ONE stage reference
  * object and each output coordinate is a primitive fused loop.
  *
  * Arithmetic bit-identical to the HOF form: per output row,
  * Σ (double) Mᵣᵢ · xᵢ accumulated left to right in a double (a float
  * input element is widened exactly like zip_with's implicit cast).
  * Null vector → null; vector elements are non-null by the callers'
  * contract (embeddings), and vector length must equal the matrix row
  * length (same contract the zip_with form required for a non-null
  * result). Property-pinned equal to the HOF form in PipelineSpec. */
case class MatVec(child: Expression, mat: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(mat.nonEmpty, "matrix must be non-empty")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "mat_vec"

  @transient private lazy val m: Array[Array[Double]] =
    mat.map(_.toArray).toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    CentroidOps.matVecAt(v.asInstanceOf[ArrayData], m, isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val matRef = ctx.addReferenceObj("rotMat", m, "double[][]")
      s"${ev.value} = graft.functions.CentroidOps.matVecAt(" +
        s"$v, $matRef, $isFloat);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): MatVec = copy(child = newChild)
}

object CentroidOps {

  /** Shared kernel for [[MatVec]]: out(r) = Σᵢ mat(r)(i) · vᵢ, double
    * accumulation left to right (float elements widened per element —
    * zip_with's cast semantics). */
  def matVecAt(v: ArrayData, mat: Array[Array[Double]],
      isFloat: Boolean): ArrayData = {
    val rows = mat.length
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      val row = mat(r)
      var acc = 0.0d
      var i = 0
      val n = row.length
      if (isFloat) {
        while (i < n) { acc += row(i) * v.getFloat(i); i += 1 }
      } else {
        while (i < n) { acc += row(i) * v.getDouble(i); i += 1 }
      }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder: `M · vec` as array<double>. */
  def matVec(vec: Column, mat: Seq[Seq[Double]]): Column =
    Bridge.column(MatVec(Bridge.expression(vec), mat))

  /** Shared kernel: `v − mat(cl)` in FLOAT arithmetic (returns null on an
    * out-of-range cluster — the `element_at` contract of the HOF form it
    * replaces). Length follows the vector. */
  def residualAt(v: ArrayData, mat: Array[Array[Float]],
      cl: Int): ArrayData = {
    if (cl < 0 || cl >= mat.length) return null
    val c = mat(cl)
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = v.getFloat(i) - (if (i < c.length) c(i) else 0.0f)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shared kernel: Σ (double) vᵢ · mat(cl)ᵢ, left-to-right double
    * accumulation — bit-identical to the `aggregate(zip_with(_*_))`
    * form. Caller guarantees `cl` in range. */
  def dotAt(v: ArrayData, mat: Array[Array[Double]], cl: Int): Double = {
    val c = mat(cl)
    val n = math.min(v.numElements(), c.length)
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += v.getFloat(i).toDouble * c(i)
      i += 1
    }
    acc
  }

  /** Column builder: `vec − centroids(cluster)` in float arithmetic. */
  def residual(vec: Column, cluster: Column,
      centroids: Seq[Seq[Float]]): Column =
    Bridge.column(CentroidResidual(Bridge.expression(vec),
      Bridge.expression(cluster), centroids))

  /** Column builder: `⟨vec, centroids(cluster)⟩` as a double. */
  def queryDot(vec: Column, cluster: Column,
      centroids: Seq[Seq[Double]]): Column =
    Bridge.column(CentroidQueryDot(Bridge.expression(vec),
      Bridge.expression(cluster), centroids))
}
