package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the per-document Gopher repetition folds
  * ([[graft.pipeline.TextAnalysis]]): the r17 in-row rewrite removed the
  * corpus-wide shuffles but left the folds as Catalyst higher-order
  * functions (`aggregate`/`transform`/`filter` lambdas), which do not
  * participate in whole-stage codegen and evaluate a ~100-line interpreted
  * lambda tree per row — the same cost class [[MatVec]]/[[NearestCentroids]]
  * were built to kill. Each kernel here is one tight primitive loop per row.
  *
  * Gram identity: two word n-grams are equal iff their
  * `concat_ws(" ", tokens)` strings are equal, and — because tokens come
  * from `split` on `\s+` and therefore contain no whitespace — iff their
  * token sequences are equal. The kernels intern each distinct token to an
  * int id (one hash-map pass) and group windows by id sequence; both
  * metrics below depend only on the GROUPING of equal grams, never on the
  * sort ORDER the HOF forms used (`sort_array` there exists solely to make
  * equal grams adjacent), so the id-based order is semantics-preserving.
  * Property-pinned bit-identical against the kept HOF reference forms in
  * TextAnalysisSpec.
  *
  * Null contract: a null token array scores 0 — exactly the HOF chain,
  * whose `when(size(t) >= n, …).otherwise(empty)` guard folds a null input
  * to the empty gram array. Array ELEMENTS are never null for the callers
  * (split output); a null element would intern like any other distinct
  * token value.
  */
private[functions] object NgramRep {

  /** Distinct-token int ids, in token order (one hash-map pass). */
  def tokenIds(toks: ArrayData): Array[Int] = {
    val L = toks.numElements()
    val ids = new Array[Int](L)
    val seen = new java.util.HashMap[UTF8String, Integer](L * 2)
    var i = 0
    while (i < L) {
      val t = toks.getUTF8String(i)
      var id = seen.get(t)
      if (id == null) { id = Integer.valueOf(seen.size()); seen.put(t, id) }
      ids(i) = id.intValue()
      i += 1
    }
    ids
  }

  /** Window start positions ordered so that equal id-sequences are
    * adjacent (total order: elementwise id comparison). */
  def sortedStarts(ids: Array[Int], n: Int): Array[Int] = {
    val W = ids.length - n + 1
    val starts = new Array[Integer](W)
    var i = 0
    while (i < W) { starts(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(starts, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val x = a.intValue(); val y = b.intValue()
        var j = 0
        while (j < n) {
          val c = Integer.compare(ids(x + j), ids(y + j))
          if (c != 0) return c
          j += 1
        }
        0
      }
    })
    val out = new Array[Int](W)
    var k = 0
    while (k < W) { out(k) = starts(k).intValue(); k += 1 }
    out
  }

  private def equalWin(ids: Array[Int], a: Int, b: Int, n: Int): Boolean = {
    var j = 0
    while (j < n) {
      if (ids(a + j) != ids(b + j)) return false
      j += 1
    }
    true
  }

  /** Max multiplicity of the doc's word n-grams (0 when fewer than n
    * tokens) — the [[graft.pipeline.TextAnalysis]] `maxRunCount ∘
    * sort_array ∘ ngramsOf` fold. */
  def maxRun(toks: ArrayData, n: Int): Long = {
    val L = toks.numElements()
    if (L < n) return 0L
    val ids = tokenIds(toks)
    val srt = sortedStarts(ids, n)
    val W = srt.length
    var best = 0L
    var i = 0
    while (i < W) {
      var j = i + 1
      while (j < W && equalWin(ids, srt(i), srt(j), n)) j += 1
      if (j - i > best) best = j - i
      i = j
    }
    best
  }

  /** Distinct word n-grams under the SHORT-DOC convention of
    * [[graft.pipeline.TextAnalysis.dupNgramPermille]]: W = max(sz−n,0)+1
    * windows — a doc shorter than n tokens is ONE whole-doc gram
    * (1 distinct), and the HOF chain folds a null token array to the
    * single empty-string gram (1 distinct) via `concat_ws` over a null
    * slice — both pinned in PipelineSpec. */
  def distinctShortTail(toks: ArrayData, n: Int): Int = {
    val L = toks.numElements()
    if (L <= n) return 1 // one window (whole doc, or the L == n gram)
    val ids = tokenIds(toks)
    val srt = sortedStarts(ids, n)
    val W = srt.length
    var distinct = 0
    var i = 0
    while (i < W) {
      var j = i + 1
      while (j < W && equalWin(ids, srt(i), srt(j), n)) j += 1
      distinct += 1
      i = j
    }
    distinct
  }

  /** Token positions covered by duplicated n-gram windows — the
    * `dupCoveredCount` interval-union fold: positions whose window string
    * occurs ≥ 2 times in the doc, ascending, union of [p, p+n). Integer
    * arithmetic identical to the HOF fold (IntegerType, same wrap
    * behavior). */
  def dupCovered(toks: ArrayData, n: Int): Int = {
    val L = toks.numElements()
    if (L < n) return 0
    val ids = tokenIds(toks)
    val srt = sortedStarts(ids, n)
    val W = srt.length
    val dup = new Array[Boolean](W) // indexed by window START position
    var i = 0
    while (i < W) {
      var j = i + 1
      while (j < W && equalWin(ids, srt(i), srt(j), n)) j += 1
      if (j - i >= 2) {
        var k = i
        while (k < j) { dup(srt(k)) = true; k += 1 }
      }
      i = j
    }
    var tot = 0
    var pe = Int.MinValue / 2
    var p = 0
    while (p < W) {
      if (dup(p)) {
        tot += n - math.max(pe - p, 0)
        pe = p + n
      }
      p += 1
    }
    tot
  }
}

/** Max multiplicity of a token array's word n-grams, as a long (0 for
  * null input or docs shorter than n tokens — the HOF chain's contract).
  * CodegenFallback: the surrounding stage stays whole-stage-codegen'd;
  * the expression is one virtual call per row, amortized over the doc. */
case class NgramMaxRun(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"ngram order must be >= 1 (got $n)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_max_run"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else NgramRep.maxRun(v.asInstanceOf[ArrayData], n)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramMaxRun = copy(child = newChild)
}

/** Token positions of a token array covered by any word n-gram occurring
  * more than once in it, as an int (0 for null input or docs shorter than
  * n tokens — the HOF chain's contract). */
case class NgramDupCovered(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"ngram order must be >= 1 (got $n)")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_dup_covered"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else NgramRep.dupCovered(v.asInstanceOf[ArrayData], n)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramDupCovered = copy(child = newChild)
}

/** Distinct word n-grams of a token array under the short-doc convention
  * (a doc shorter than n tokens is one whole-doc gram), as an int; null
  * input → 1 (the HOF chain's null-slice fold — see
  * [[NgramRep.distinctShortTail]]). */
case class NgramDistinctShortTail(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"ngram order must be >= 1 (got $n)")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_distinct_short_tail"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 1
    else NgramRep.distinctShortTail(v.asInstanceOf[ArrayData], n)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramDistinctShortTail = copy(child = newChild)
}

object NgramRepetition {
  /** Max multiplicity of the word n-grams of a token-array column. */
  def maxRun(tokens: Column, n: Int): Column =
    Bridge.column(NgramMaxRun(Bridge.expression(tokens), n))

  /** Distinct short-tail-convention word n-grams of a token-array
    * column. */
  def distinctShortTail(tokens: Column, n: Int): Column =
    Bridge.column(NgramDistinctShortTail(Bridge.expression(tokens), n))

  /** Covered-token count of duplicated word n-grams of a token-array
    * column. */
  def dupCovered(tokens: Column, n: Int): Column =
    Bridge.column(NgramDupCovered(Bridge.expression(tokens), n))
}
