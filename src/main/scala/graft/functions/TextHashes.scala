package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle hasher: distinct xxhash64 values of the word n-grams of a
  * token array, first-occurrence order.
  *
  * Replaces the `transform(sequence(...), i => xxhash64(concat_ws(" ",
  * slice(toks, i+1, n))))` + `array_distinct` higher-order-function chain:
  * HOF lambdas are interpreted per element (closure dispatch + a fresh
  * slice array + a concat allocation per shingle position), which profiled
  * as the dominant cost of the MinHash/ngram pipelines. This expression is
  * one tight loop per row — token windows are joined and hashed directly,
  * dedup'd in a LinkedHashSet. CodegenFallback: the surrounding stage stays
  * whole-stage-codegen'd; the expression itself is a single virtual call
  * per row, amortized over all its shingles.
  *
  * Matches the former HOF semantics exactly (same " " separator, same
  * xxhash64 seed 42, same short tail window of < n tokens, distinct set) —
  * PipelineSpec's LSH ≡ brute-force equality pins this.
  */
case class DistinctShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "distinct_shingle_hashes"

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val windows = math.max(sz - n, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](windows * 2)
    var i = 0
    while (i < windows) {
      val m = math.min(n, sz - i)
      val parts = new Array[UTF8String](math.max(m, 0))
      var j = 0
      while (j < m) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val joined = UTF8String.concatWs(sep, parts: _*)
      seen.add(XXH64.hashUnsafeBytes(
        joined.getBaseObject, joined.getBaseOffset, joined.numBytes, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): DistinctShingleHashes = copy(child = newChild)
}

object TextHashes {
  /** Distinct word-n-gram shingle hashes of a token-array column. */
  def distinctShingleHashes(tokens: Column, n: Int): Column =
    Bridge.column(DistinctShingleHashes(Bridge.expression(tokens), n))
}
