package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftExpectsInputTypes
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native text statistics (§2.11 analysis operators).
  *
  * The HOF/regex compositions these replace were the slowest per-row
  * work in the suite at scale: `split` with lookaround boundaries plus
  * an interpreted `filter` lambda per piece (subword count), four
  * tokenize+filter passes re-evaluated per reference because
  * higher-order functions are CodegenFallback and excluded from
  * common-subexpression elimination (language-ID voting), and repeated
  * whole-string `regexp_replace` scans (case/punct ratios). Measured at
  * ~6M-row scale: q43 15s -> sub-second-class, q44 7s similarly.
  *
  * Each expression is a single JIT'd loop via a static call, and being
  * codegen'd (not CodegenFallback) it participates in CSE — referencing
  * the result five times costs one evaluation. Semantics are
  * bit-identical to the HOF forms (the CORRECTNESS oracle pins them).
  */

/** Subword (BPE-ish word-piece) count: maximal letter/digit runs plus
  * every non-alphanumeric, non-space character — exactly the pieces of
  * `split(text, "(?<=[^\p{L}\p{N}])|(?=[^\p{L}\p{N}])")` that survive
  * `trim(piece) != ''` (ASCII-space trim, like Spark's `trim`).
  */
case class SubwordCountExpr(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "subword_count"
  override def nullSafeEval(input: Any): Any =
    TextStatsOps.subwordCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsOps$$.MODULE$$.subwordCount($c)")
  override protected def withNewChildInternal(newChild: Expression): SubwordCountExpr =
    copy(child = newChild)
}

/** `[letters, uppercase letters, punctuation]` counts in one pass —
  * the categories `\p{L}`, `\p{Lu}`, `\p{Punct}` (ASCII POSIX punct,
  * matching Java regex without UNICODE_CHARACTER_CLASS).
  */
case class CharClassCountsExpr(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_class_counts"
  override def nullSafeEval(input: Any): Any =
    TextStatsOps.charClassCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsOps$$.MODULE$$.charClassCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): CharClassCountsExpr =
    copy(child = newChild)
}

/** Stopword votes `[en, de, es, fr]`: tokens = lowercased text split on
  * Java-regex `\s+` (ASCII whitespace), each token voted against the
  * four static stopword lists — the single-pass form of four
  * `size(filter(split(lower(trim(text)), "\s+"), _.isin(list)))`
  * evaluations.
  */
case class StopwordVotesExpr(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_votes"
  override def nullSafeEval(input: Any): Any =
    TextStatsOps.stopwordVotes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsOps$$.MODULE$$.stopwordVotes($c)")
  override protected def withNewChildInternal(newChild: Expression): StopwordVotesExpr =
    copy(child = newChild)
}

/** `[token count, non-whitespace chars]` in one pass, reproducing the
  * regex forms exactly: token count = `size(split(trim(text), "\s+"))`
  * with the empty-string -> 0 guard — including BOTH split artifacts
  * (Spark's split uses limit -1, so leading AND trailing non-space
  * whitespace each contribute an empty piece), chars =
  * `length(regexp_replace(trim(text), "\s+", ""))`.
  */
case class TokenStatsExpr(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_stats"
  override def nullSafeEval(input: Any): Any =
    TextStatsOps.tokenStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsOps$$.MODULE$$.tokenStats($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

object TextStatsOps {
  private def isAlnum(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  def subwordCount(text: UTF8String): Int = {
    val s = text.toString
    var count = 0
    var inRun = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isAlnum(cp)) {
        if (!inRun) { count += 1; inRun = true }
      } else {
        inRun = false
        if (cp != ' ') count += 1
      }
      i += Character.charCount(cp)
    }
    count
  }

  // ASCII POSIX punct, the Java-regex \p{Punct} class.
  private val PunctSet = """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".toSet

  def charClassCounts(text: UTF8String): GenericArrayData = {
    val s = text.toString
    var letters = 0; var uppers = 0; var punct = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        if (Character.getType(cp) == Character.UPPERCASE_LETTER) uppers += 1
      } else if (cp < 128 && PunctSet.contains(cp.toChar)) punct += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(letters, uppers, punct))
  }

  private val StopEn = Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
  private val StopDe = Set("der", "die", "und", "das", "ist", "ein", "nicht", "mit", "den", "von")
  private val StopEs = Set("el", "la", "de", "que", "y", "en", "un", "es", "los", "por")
  private val StopFr = Set("le", "la", "les", "de", "et", "un", "est", "que", "pour", "dans")

  // Java-regex \s (ASCII): space, tab, LF, VT, FF, CR.
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def tokenStats(text: UTF8String): GenericArrayData = {
    // Spark's trim() strips ASCII space (0x20) only.
    val s = text.trim().toString
    if (s.isEmpty) return new GenericArrayData(Array(0, 0))
    // split(_, "\s+") with Spark's limit=-1 keeps an empty piece at
    // EACH end when the (space-trimmed) text starts/ends with other
    // whitespace ("\t" -> ["", ""], size 2).
    var tokens = (if (isWs(s.charAt(0))) 1 else 0) +
      (if (isWs(s.charAt(s.length - 1))) 1 else 0)
    var nonWs = 0
    var i = 0
    val n = s.length
    var inRun = false
    while (i < n) {
      if (isWs(s.charAt(i))) inRun = false
      else {
        if (!inRun) { tokens += 1; inRun = true }
        nonWs += 1
      }
      i += 1
    }
    new GenericArrayData(Array(tokens, nonWs))
  }

  def stopwordVotes(text: UTF8String): GenericArrayData = {
    // lower() first, like the HOF form (per-token result is identical).
    val s = text.toLowerCase.toString
    var en = 0; var de = 0; var es = 0; var fr = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val tok = s.substring(start, i)
        if (StopEn.contains(tok)) en += 1
        if (StopDe.contains(tok)) de += 1
        if (StopEs.contains(tok)) es += 1
        if (StopFr.contains(tok)) fr += 1
      }
    }
    new GenericArrayData(Array(en, de, es, fr))
  }
}
