package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftExpectsInputTypes
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram expressions for the repetition-quality family (§2.11
  * extensions; the Gopher-style repetition filters of Rae et al. 2021,
  * "Scaling Language Models", appendix A1.1).
  *
  * Tokenization matches the suite's convention exactly — lowercased,
  * split on ASCII whitespace runs, empties dropped — i.e. the DuckDB
  * mirror `list_filter(string_split_regex(lower(trim(text)), '\s+'),
  * t -> t <> '')`, so every derived statistic is oracle-checkable.
  *
  * Both expressions are codegen'd single passes (no HOF lambda per
  * n-gram, no CodegenFallback), following `TextStatsExprs`: the stats
  * form exists because composing explode + groupBy for a PER-DOCUMENT
  * statistic would shuffle the corpus at n-gram grain — a per-row local
  * hash count keeps the 100 TB form embarrassingly parallel inside the
  * scan.
  */

/** All consecutive `n`-token windows of the text, each joined by a
  * single space — `array_to_string(t[i:i+n-1], ' ')` over the token
  * array in DuckDB terms. Fewer than `n` tokens -> empty array.
  */
case class NgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with GraftExpectsInputTypes {
  require(n >= 1, s"n must be >= 1, got $n")
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams"
  override def nullSafeEval(input: Any): Any =
    NgramOps.ngrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramOps$$.MODULE$$.ngrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramsExpr =
    copy(child = newChild)
}

/** `[total, top, dup]` n-gram occurrence counts in one pass:
  * `total` = number of n-gram occurrences (max(tokens - n + 1, 0)),
  * `top` = occurrences of the most frequent n-gram, `dup` = occurrences
  * whose n-gram appears at least twice. `top/total` is the
  * top-n-gram fraction and `dup/total` the duplicate-n-gram fraction of
  * the Gopher repetition filters.
  */
case class NgramRepetitionExpr(child: Expression, n: Int)
    extends UnaryExpression with GraftExpectsInputTypes {
  require(n >= 1, s"n must be >= 1, got $n")
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_repetition"
  override def nullSafeEval(input: Any): Any =
    NgramOps.repetitionStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramOps$$.MODULE$$.repetitionStats($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramRepetitionExpr =
    copy(child = newChild)
}

object NgramOps {

  // Java-regex \s (ASCII): space, tab, LF, VT, FF, CR — the same class
  // TextStatsOps uses, so tokenization is identical across the suite.
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Lowercased whitespace tokens, empties dropped. */
  private def tokenize(text: UTF8String): Array[String] = {
    val s = text.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  def ngrams(text: UTF8String, n: Int): GenericArrayData = {
    val toks = tokenize(text)
    val total = math.max(toks.length - n + 1, 0)
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def repetitionStats(text: UTF8String, n: Int): GenericArrayData = {
    val toks = tokenize(text)
    val total = math.max(toks.length - n + 1, 0)
    if (total == 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val counts = new JHashMap[String, Long](total * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c >= 2L) dup += c
    }
    new GenericArrayData(Array(total.toLong, top, dup))
  }
}
