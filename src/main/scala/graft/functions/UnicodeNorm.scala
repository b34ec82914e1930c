package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge, GraftExpectsInputTypes}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for multilingual dedup/join keys.
  *
  * Spark ships no NFC/NFD builtin, yet byte-equality on raw UTF-8 is
  * wrong for any corpus with mixed input methods: "café" composed
  * (U+00E9) and decomposed (e + U+0301) are different byte strings
  * that every exact-dedup hash, groupBy key, and join key in this
  * library would treat as distinct documents. Canonical-equivalent
  * text MUST normalize before it reaches a key — at 100 TB that is the
  * difference between a correct dedup ratio and silently keeping both
  * spellings of every accented word.
  *
  * [[UnicodeNormExpr]] wraps `java.text.Normalizer` (the JDK's ICU
  * lineage) as a codegen'd unary expression; [[UnicodeNormOps.normKey]]
  * composes the standard fold chain — NFD, strip combining marks
  * (`\p{Mn}`), NFC, lowercase — matching DuckDB's
  * `lower(strip_accents(x))` on Latin-script text, which is what lets
  * q103 pin the whole chain against a full-value oracle.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real text (ASCII is always NFC), so the
  * expensive normalize only runs on the rows that need it.
  */
case class UnicodeNormExpr(child: Expression, form: String)
    extends UnaryExpression with GraftExpectsInputTypes {

  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_${form.toLowerCase}"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormOps.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormOps$$.MODULE$$.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormExpr =
    copy(child = newChild)
}

object UnicodeNormOps {

  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def nfc(c: Column): Column =
    Bridge.column(UnicodeNormExpr(Bridge.expression(c), "NFC"))
  def nfd(c: Column): Column =
    Bridge.column(UnicodeNormExpr(Bridge.expression(c), "NFD"))
  def nfkc(c: Column): Column =
    Bridge.column(UnicodeNormExpr(Bridge.expression(c), "NFKC"))

  /** Canonical fold key: NFD -> drop combining marks -> NFC -> lower.
    * On Latin scripts this equals DuckDB `lower(strip_accents(x))`.
    */
  def normKey(c: Column): Column = {
    import org.apache.spark.sql.functions.{lower, regexp_replace}
    lower(nfc(regexp_replace(nfd(c), "\\p{Mn}+", "")))
  }
}
