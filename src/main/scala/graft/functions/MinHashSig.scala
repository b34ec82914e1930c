package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native Catalyst expression: lowercase,
  * whitespace-tokenize, form word n-gram shingles, and fold all
  * `numHashes` running minimums — one tight JIT'd loop per row.
  *
  * The HOF composition (split/transform/slice/concat_ws + fold) is
  * interpreted element-at-a-time with per-step array allocation; at
  * corpus scale the signature pass IS the near-dedup job, so this is
  * the op that decides whether MinHash-LSH is viable at 100 TB.
  * Hashing uses Spark's own XXH64 (same family as the builtin
  * xxhash64), seed 42; permutation j of a shingle is
  * hashLong(base_hash, j).
  *
  * Duplicate shingles need no dedup here: duplicates can never change
  * a minimum.
  */
case class MinHashSigExpr(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[org.apache.spark.sql.types.DataType]] =
    Seq(Seq(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashOps.signature(input.asInstanceOf[UTF8String], shingleN, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashOps$$.MODULE$$.signature($c, $shingleN, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashOps {
  private val Seed = 42L

  def signature(text: UTF8String, shingleN: Int, numHashes: Int): ArrayData = {
    // UTF8String.toLowerCase: the exact semantics of Spark's lower()
    // used by the Jaccard-verify tokenization (WordShinglesExpr) —
    // locale-independent across executor JVMs, and agreeing with the
    // verify path even on non-ASCII full-vs-simple case-mapping edges
    // (Java's Locale.ROOT full mapping diverges on e.g. U+0130).
    val toks = text.toLowerCase.toString.trim.split("\\s+")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = toks.length - shingleN + 1
    var i = 0
    while (i < nShingles) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < shingleN) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val base = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed)
      var j = 0
      while (j < numHashes) {
        val p = XXH64.hashLong(base, j)
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-facing API. */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(text), shingleN, numHashes))
}
