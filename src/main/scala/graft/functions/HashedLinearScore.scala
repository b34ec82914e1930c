package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `[n_tokens, weight_total]` of the hashed-bag-of-words linear model
  * ([[graft.ops.HashedClassifier]]) as ONE native pass per row.
  *
  * The HOF spelling (transform + aggregate with md5/conv/concat inside
  * the lambda) evaluates interpreted Catalyst nodes per token — ~10 µs
  * each measured at sf1m (27 s for 50k docs). This loop does one
  * MessageDigest md5 per token against a PRECOMPUTED per-bucket weight
  * table (weights depend only on (salt, buckets): 4096 md5s once per
  * JVM, not two md5s + a decimal-string concat per token), cutting the
  * score to digest cost. Semantics are bit-identical: same whitespace
  * tokenization of the lowercased text, same 60-bit md5-prefix
  * integers the DuckDB oracle recomputes.
  */
case class HashedLinearScoreExpr(child: Expression, buckets: Int, salt: String)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] =
    Seq(Seq(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_linear_score"

  override def nullSafeEval(input: Any): Any =
    HashedLinearOps.score(input.asInstanceOf[UTF8String], buckets, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedLinearOps$$.MODULE$$.score($c, $buckets, $saltRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScoreExpr =
    copy(child = newChild)
}

object HashedLinearOps {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(bytes) as a 60-bit non-negative long —
    * the engine-portable `('0x' || substr(md5(x),1,15))::BIGINT`.
    */
  def h60(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    // 15 hex digits = 7.5 bytes: bytes 0-6 fully, high nibble of byte 7.
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  /** Per-bucket weight table for (salt, buckets), computed once per JVM
    * per configuration: weight(b) = h60(salt || b) % 2000001 - 1e6.
    */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Array[Long]]()

  def weights(salt: String, buckets: Int): Array[Long] =
    weightCache.computeIfAbsent((salt, buckets), { case (s, n) =>
      Array.tabulate(n) { b =>
        h60((s + b.toString).getBytes(StandardCharsets.UTF_8)) % 2000001L - 1000000L
      }
    })

  def score(text: UTF8String, buckets: Int, salt: String): ArrayData = {
    val w = weights(salt, buckets)
    // UTF8String.toLowerCase = the exact semantics of Spark's lower()
    // (the HOF/oracle path) — Java's toLowerCase(Locale.ROOT) applies
    // FULL Unicode case mapping and can diverge on e.g. U+0130, which
    // would change tokenization vs the oracle on non-ASCII corpora.
    val s = text.toLowerCase.toString
    var nTokens = 0L
    var total = 0L
    var i = 0
    val len = s.length
    // Exactly the Java-regex \s class the HOF spelling split on.
    def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    while (i < len) {
      while (i < len && ws(s.charAt(i))) i += 1
      val start = i
      while (i < len && !ws(s.charAt(i))) i += 1
      if (i > start) {
        val tok = s.substring(start, i).getBytes(StandardCharsets.UTF_8)
        total += w((h60(tok) % buckets).toInt)
        nTokens += 1L
      }
    }
    new GenericArrayData(Array(nTokens, total))
  }
}
