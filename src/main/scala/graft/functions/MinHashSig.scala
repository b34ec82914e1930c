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

  // xxHash64 constants (public xxHash specification / Spark's XXH64).
  // hashLong(input, seed) factors as fmix(rotl((seed + P5 + 8) ^ k1(input),
  // 27) * P1 + P4) where k1(input) = rotl(input * P2, 31) * P1 depends
  // ONLY on the input — so k1 hoists out of the per-shingle k-mix loop,
  // turning each of the numHashes probes into xor+rotl+mul+add+fmix.
  // Bit-identical to XXH64.hashLong (pinned by FunctionsSpec).
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  def signature(text: UTF8String, shingleN: Int, numHashes: Int): ArrayData = {
    // UTF8String.toLowerCase: the exact semantics of Spark's lower()
    // used by the Jaccard-verify tokenization (WordShinglesExpr) —
    // locale-independent across executor JVMs, and agreeing with the
    // verify path even on non-ASCII full-vs-simple case-mapping edges
    // (Java's Locale.ROOT full mapping diverges on e.g. U+0130).
    //
    // Tokenization runs at the BYTE level, replicating
    // `toString.trim.split("\\s+")` exactly with zero per-token/
    // per-shingle allocation (one reusable buffer for the whole row):
    // trim strips end chars <= U+0020, the split separators are the
    // six ASCII \s bytes — both single-byte in UTF-8, so a byte scan
    // is exact (multi-byte codepoints never contain ASCII bytes).
    val bytes = text.toLowerCase.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && (bytes(lo) & 0xFF) <= 0x20) lo += 1
    while (hi > lo && (bytes(hi - 1) & 0xFF) <= 0x20) hi -= 1
    @inline def isSep(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0D)
    // Token offset scan (starts/ends as parallel int arrays).
    var nToks = 0
    var i = lo
    var inTok = false
    while (i < hi) {
      val sep = isSep(bytes(i))
      if (!sep && !inTok) nToks += 1
      inTok = !sep
      i += 1
    }
    // `"".split("\\s+")` yields one EMPTY token — replicated so empty/
    // whitespace-only rows keep their historical shingleN=1 signature.
    val emptyInput = nToks == 0
    if (emptyInput) nToks = 1
    val starts = new Array[Int](nToks)
    val ends = new Array[Int](nToks)
    if (emptyInput) { starts(0) = lo; ends(0) = lo }
    else {
      var t = 0; i = lo; inTok = false
      while (i < hi) {
        val sep = isSep(bytes(i))
        if (!sep && !inTok) { starts(t) = i; t += 1 }
        if (sep && inTok) ends(t - 1) = i
        inTok = !sep
        i += 1
      }
      if (inTok) ends(t - 1) = hi
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = nToks - shingleN + 1
    // Shingle bytes = tokens joined by single ' '; the trimmed row is
    // an upper bound on any shingle's length (separator runs only
    // shrink to one space).
    val buf = new Array[Byte](math.max(hi - lo, 1))
    i = 0
    while (i < nShingles) {
      var len = 0
      var k = 0
      while (k < shingleN) {
        if (k > 0) { buf(len) = ' '; len += 1 }
        val s = starts(i + k)
        val l = ends(i + k) - s
        System.arraycopy(bytes, s, buf, len, l)
        len += l
        k += 1
      }
      val base = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      val k1 = java.lang.Long.rotateLeft(base * P2, 31) * P1
      var j = 0
      while (j < numHashes) {
        var h = (j + P5 + 8L) ^ k1
        h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
        h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
        if (h < mins(j)) mins(j) = h
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
