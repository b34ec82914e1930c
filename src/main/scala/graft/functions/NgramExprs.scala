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

/** All the Gopher n-gram repetition signals for SEVERAL n's in ONE
  * tokenize pass — the hot-path form behind the full Table A1 rule
  * family (one tokenization + one count map per n, versus one
  * tokenization PER n for composed [[NgramRepetitionExpr]]s, and no
  * per-gram string materialization at all: gram identity is the
  * packed token-id window, EXACT — not a hash trade).
  *
  * Output layout (array<long>):
  *   [0] n_tokens, [1] sum_token_chars (total character mass of the
  *   tokens — the denominator of every character-fraction cut),
  *   then per n in `ns` order: [total, top, top_chars, dup, dup_chars]:
  *   - total/top/dup are [[NgramRepetitionExpr]]'s counts;
  *   - top_chars = occurrences x token-char-mass of the most frequent
  *     n-gram (Gopher's "top n-gram character fraction" numerator;
  *     count ties break toward the LARGER character mass — the
  *     deterministic, oracle-replayable choice);
  *   - dup_chars = character mass of tokens COVERED by at least one
  *     n-gram occurring 2+ times (union of windows — each token
  *     position counts once however many duplicate grams cover it;
  *     Rae et al. 2021 A1.1 count duplicated n-gram characters "taking
  *     care not to count characters that occur in overlapping n-grams
  *     more than once").
  *   Character mass is TOKEN characters only (joining whitespace
  *   excluded) on both sides of every fraction, so the convention
  *   cancels consistently.
  */
case class MultiNgramStatsExpr(child: Expression, ns: Seq[Int])
    extends UnaryExpression with GraftExpectsInputTypes {
  require(ns.nonEmpty && ns.forall(_ >= 1), s"every n must be >= 1, got $ns")
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_ngram_stats"
  override def nullSafeEval(input: Any): Any =
    NgramOps.multiStats(input.asInstanceOf[UTF8String], ns.toArray)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", ns.toArray, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramOps$$.MODULE$$.multiStats($c, $nsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): MultiNgramStatsExpr =
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

  /** See [[MultiNgramStatsExpr]]. One tokenize; per n one count pass +
    * one coverage pass. Gram identity is EXACT: tokens are interned to
    * dense int ids and an n-gram keys the count map as the ids packed
    * into one long when they fit (n * bitsPerId <= 63), else as the
    * joined string — two spellings of the same exact identity, so no
    * collision trade anywhere.
    */
  def multiStats(text: UTF8String, ns: Array[Int]): GenericArrayData = {
    val toks = tokenize(text)
    val nToks = toks.length
    // Intern tokens to dense ids (gram keys compare ints, not strings).
    val idMap = new JHashMap[String, Integer](nToks * 2)
    val ids = new Array[Int](nToks)
    val lens = new Array[Int](nToks)
    var sumChars = 0L
    var i = 0
    while (i < nToks) {
      var id = idMap.get(toks(i))
      if (id == null) { id = Integer.valueOf(idMap.size); idMap.put(toks(i), id) }
      ids(i) = id.intValue
      lens(i) = toks(i).length
      sumChars += lens(i)
      i += 1
    }
    val nDistinct = idMap.size
    var bitsPerId = 1
    while ((1 << bitsPerId) < nDistinct) bitsPerId += 1
    // Prefix sums of token char lengths: gram (start i, n) has token
    // char mass pre(i + n) - pre(i).
    val pre = new Array[Long](nToks + 1)
    i = 0
    while (i < nToks) { pre(i + 1) = pre(i) + lens(i); i += 1 }
    val out = new Array[Any](2 + ns.length * 5)
    out(0) = nToks.toLong
    out(1) = sumChars
    val covered = new Array[Boolean](nToks)
    var k = 0
    while (k < ns.length) {
      val n = ns(k)
      val total = math.max(nToks - n + 1, 0)
      var top = 0L
      var topChars = 0L
      var dup = 0L
      var dupChars = 0L
      if (total > 0) {
        val packed = n.toLong * bitsPerId <= 63
        // Count pass.
        val longCounts: JHashMap[java.lang.Long, Long] =
          if (packed) new JHashMap(total * 2) else null
        val strCounts: JHashMap[String, Long] =
          if (packed) null else new JHashMap(total * 2)
        val sb = if (packed) null else new java.lang.StringBuilder
        def key(start: Int): java.lang.Long = {
          var h = 0L
          var j = 0
          while (j < n) { h = (h << bitsPerId) | ids(start + j); j += 1 }
          java.lang.Long.valueOf(h)
        }
        def skey(start: Int): String = {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' '); sb.append(toks(start + j)); j += 1
          }
          sb.toString
        }
        i = 0
        while (i < total) {
          if (packed) longCounts.merge(key(i), 1L, (a, b) => a + b)
          else strCounts.merge(skey(i), 1L, (a, b) => a + b)
          i += 1
        }
        val it = (if (packed) longCounts.values() else strCounts.values()).iterator()
        while (it.hasNext) {
          val c = it.next()
          if (c > top) top = c
          if (c >= 2L) dup += c
        }
        // Position pass: the top gram's char mass (count ties toward
        // the larger mass) and — when duplicates exist — the union of
        // duplicate-gram windows, then the covered character mass.
        if (dup > 0L) java.util.Arrays.fill(covered, false)
        i = 0
        while (i < total) {
          val c = if (packed) longCounts.get(key(i)) else strCounts.get(skey(i))
          if (c == top) {
            val tc = c * (pre(i + n) - pre(i))
            if (tc > topChars) topChars = tc
          }
          if (dup > 0L && c >= 2L) {
            var j = i
            val end = i + n
            while (j < end) { covered(j) = true; j += 1 }
          }
          i += 1
        }
        if (dup > 0L) {
          i = 0
          while (i < nToks) {
            if (covered(i)) dupChars += lens(i)
            i += 1
          }
        }
      }
      out(2 + k * 5) = total.toLong
      out(3 + k * 5) = top
      out(4 + k * 5) = topChars
      out(5 + k * 5) = dup
      out(6 + k * 5) = dupChars
      k += 1
    }
    new GenericArrayData(out)
  }
}
