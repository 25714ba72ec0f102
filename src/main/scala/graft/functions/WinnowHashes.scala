package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprinter (Schleimer et al., SIGMOD'03): polynomial
  * rolling hash of every `k`-codepoint gram, minimum per `w`-wide window,
  * distinct in first-occurrence order.
  *
  * Exists for the same reason as [[DistinctShingleHashes]]: the
  * higher-order-function formulation (codes transform → hash transform →
  * window-min transform) is re-inlined by CollapseProject so every
  * element_at recomputes its upstream arrays — O(n³) per document where
  * this loop is O(n·(k + w)). The arithmetic is engine-portable on purpose
  * (code points via `codePoints`, hash = (Σ code·257^(k−1−i)) mod 10⁹+7 in
  * exact Long math, |terms| ≤ 5·1.1e6·257⁴ < 2⁶³), so the DuckDB oracle
  * reproduces it with ascii()/substr() term by term.
  *
  * Documents shorter than k + w − 1 codepoints yield an empty array.
  * CodegenFallback: one virtual call per row, amortized over all windows.
  */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "gram and window widths must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  private val M = 1000000007L
  private val pow: Array[Long] = Array.iterate(1L, k)(_ * 257L)

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = codes.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hs = new Array[Long](m)
    var j = 0
    while (j < m) {
      var acc = 0L
      var i = 0
      while (i < k) { acc += codes(j + i).toLong * pow(k - 1 - i); i += 1 }
      hs(j) = acc % M
      j += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var a = 0
    while (a <= m - w) {
      var mn = Long.MaxValue
      var b = 0
      while (b < w) { val v = hs(a + b); if (v < mn) mn = v; b += 1 }
      seen.add(mn)
      a += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowHashes = copy(child = newChild)
}

object WinnowHashes {
  def winnowHashes(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowHashes(Bridge.expression(text), k, w))
}
