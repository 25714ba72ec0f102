package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenization of a text column under a FIXED merge table
  * ([[graft.pipeline.Bpe]] trains it): lower-cased whitespace words, each
  * reduced by applying the lowest-ranked applicable merge at its leftmost
  * occurrence until none applies, concatenated in document order.
  *
  * The merge table rides the expression node as one reference object (a
  * rank map keyed left + "\u001f" + right — the separator keeps pairs
  * like ("ab","c") and ("a","bc") distinct; symbols never contain
  * whitespace because words are whitespace-split), so the plan is
  * constant-size in the vocabulary and the kernel runs inside whole-stage codegen — same
  * pattern as [[NearestCentroids]]. Word splitting matches
  * `TextAnalysis.tokens` (split(trim(lower(text)), "\\s+")): ASCII-space
  * trim, whole-string lowercase, regex split keeping a single empty word
  * for empty input (which yields zero tokens).
  *
  * Null contract: null text → null. */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + "\u001f" + r, Integer.valueOf(i))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeTokens.tokenizeAll(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
        "java.util.HashMap<String, Integer>")
      s"${ev.value} = graft.functions.BpeTokens.tokenizeAll($v, $ranksRef);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokens = copy(child = newChild)
}

object BpeTokens {

  /** Kernel shared by interpreted eval and generated code. */
  def tokenizeAll(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    // trim of ' ' + lowercase + "\s+" split, matching Spark's
    // trim/lower/split(-1) semantics (UTF8String.trim strips 0x20 only)
    val s = text.trim().toLowerCase().toString
    val words = s.split("\\s+", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      tokenizeWord(words(wi), ranks, out)
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** One word: start from characters, repeatedly apply the lowest-ranked
    * applicable merge at its leftmost occurrence. Appends the final
    * symbols (as UTF8String) to `out`. */
  private def tokenizeWord(word: String,
      ranks: java.util.HashMap[String, Integer],
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    if (word.isEmpty) return
    val syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      syms(i) = String.valueOf(word.charAt(i)); i += 1
    }
    var n = syms.length
    var done = false
    while (!done && n > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < n - 1) {
        val r = ranks.get(syms(j) + "\u001f" + syms(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPos = j
        }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        syms(bestPos) = syms(bestPos) + syms(bestPos + 1)
        var k = bestPos + 1
        while (k < n - 1) { syms(k) = syms(k + 1); k += 1 }
        n -= 1
      }
    }
    i = 0
    while (i < n) { out += UTF8String.fromString(syms(i)); i += 1 }
  }

  /** Column builder: BPE tokens of `text` under the fixed merge table. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokens(Bridge.expression(text), merges))
}
