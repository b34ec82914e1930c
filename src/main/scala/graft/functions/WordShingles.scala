package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftExpectsInputTypes
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as a native expression: lowercase,
  * whitespace-tokenize, slide an n-window, join with single spaces,
  * keep first occurrences — one pass, one output array.
  *
  * Replaces the HOF composition (`transform(sequence(...), i ->
  * concat_ws(" ", slice(tokens, i+1, n)))` + `array_distinct`), which
  * ran an interpreted slice+concat per shingle per row and re-executed
  * for every plan reference — the shingle build was the dominant cost
  * of near-dup verification at multi-million-row scale. Fewer than `n`
  * tokens -> empty array (the oracle's `range` semantics; the HOF
  * form's degenerate negative-sequence edge was unreachable on real
  * documents).
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with GraftExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(input: Any): Any =
    WordShinglesOps.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesOps$$.MODULE$$.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

/** Distinct word n-gram shingles as 64-bit hashes (`xxh64` over the
  * shingle's UTF-8 bytes, seed 42 — the same hash family the MinHash
  * signature uses). For set operations (Jaccard) the hash IS the
  * element: an 8-byte long shuffles ~3x lighter than the shingle
  * string, and the only semantic gap is a same-pair 64-bit collision
  * (~1e-13 for 1k-shingle documents) — the standard trade every
  * large-scale near-dedup pipeline makes.
  */
case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with GraftExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    WordShinglesOps.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesOps$$.MODULE$$.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashesExpr =
    copy(child = newChild)
}

object WordShinglesOps {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def tokenize(s: String): scala.collection.mutable.ArrayBuffer[String] = {
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) tokens += s.substring(start, i)
    }
    tokens
  }

  /** Build each shingle into a shared buffer and hand it to `emit`. */
  private def eachShingle(text: UTF8String, n: Int)(emit: java.lang.StringBuilder => Unit): Unit = {
    // lower() before tokenizing, matching split(lower(trim(text)), "\s+").
    val tokens = tokenize(text.toLowerCase.toString)
    val count = tokens.length - n + 1
    if (count <= 0) return
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < count) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tokens(j + k))
        k += 1
      }
      emit(sb)
      j += 1
    }
  }

  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val seen = new java.util.LinkedHashSet[String]()
    eachShingle(text, n)(sb => seen.add(sb.toString))
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }

  private val Seed = 42L

  def shingleHashes(text: UTF8String, n: Int): GenericArrayData = {
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    eachShingle(text, n) { sb =>
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed))
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next().longValue(); m += 1 }
    new GenericArrayData(out)
  }
}
