package graft.functions


import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact micro-nat token-distribution Shannon entropy of a document as
  * ONE native pass: ln(n) − (Σ k·⌊ln(k)·1e6⌉) / n on the integer grid
  * (⌊·⌉ = rint, / truncating — the spelling the q123 oracle mirrors).
  *
  * The HOF spelling (`transform(array_distinct(toks), t ->
  * size(filter(toks, = t)))`) is O(distinct · n) per document with an
  * interpreted lambda per comparison — 9.4 s warm for 500k docs at
  * sf10m. This is one tokenize pass + a per-document hash map:
  * O(n) with JIT'd string hashing, same doubles (java.lang.Math.log /
  * Math.rint are exactly what Catalyst's log/rint evaluate).
  */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] =
    Seq(Seq(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "token_entropy_micro"

  override def nullSafeEval(input: Any): Any =
    TokenEntropyOps.entropyMicro(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenEntropyOps$$.MODULE$$.entropyMicro($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)
}

object TokenEntropyOps {
  private def microLn(k: Long): Long =
    Math.rint(Math.log(k.toDouble) * 1000000.0).toLong

  def entropyMicro(text: UTF8String): Long = {
    // UTF8String.toLowerCase = the exact semantics of Spark's lower()
    // (what the oracle mirrors); Java's full-Unicode case mapping can
    // diverge on non-ASCII (e.g. U+0130) and change tokenization.
    val s = text.toLowerCase.toString
    val counts = new java.util.HashMap[String, Array[Int]]()
    var n = 0L
    var i = 0
    val len = s.length
    def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    while (i < len) {
      while (i < len && ws(s.charAt(i))) i += 1
      val start = i
      while (i < len && !ws(s.charAt(i))) i += 1
      if (i > start) {
        val tok = s.substring(start, i)
        val slot = counts.get(tok)
        if (slot == null) counts.put(tok, Array(1)) else slot(0) += 1
        n += 1L
      }
    }
    if (n == 0L) return 0L
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val k = it.next()(0).toLong
      sum += k * microLn(k)
    }
    microLn(n) - sum / n
  }
}
