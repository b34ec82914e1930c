package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Re-sorts a hashed token set (`array<long>`) under the
  * frequency-aware global total order the exact-Jaccard prefix filter
  * uses when `freqOrdered` is on (the AllPairs/PPJoin document-
  * frequency ordering — Bayardo et al., WWW'07; Xiao et al., WWW'08):
  *
  *  - tokens NOT in the broadcast heavy-token table first, ordered by
  *    signed hash value (the same order `array_sort` gives — every
  *    non-heavy token has corpus df <= the table's smallest df);
  *  - heavy tokens LAST, by descending df rank index (rank 0 = the
  *    corpus's most frequent token sorts at the very end).
  *
  * Prefixes (the first |x| − ceil(t·|x|) + 1 elements) then hold each
  * document's RAREST tokens, which minimizes candidate pairs out of
  * the prefix-token equi-join: a stop-shingle shared by m documents
  * joins ~m²/2 candidate rows if it lands in prefixes, but under this
  * order it sorts last and only enters a prefix when the document is
  * almost nothing but stop-shingles. Any fixed total order keeps the
  * prefix theorem EXACT, so the heavy table being a top-K
  * approximation of the true df order costs recall nothing — it only
  * bounds how much candidate volume the reorder can remove.
  *
  * The table rides the expression as plan-referenced primitive arrays
  * (tokens sorted for binary search, aligned rank indexes, and the
  * rank -> token inverse), shipped once per stage with the task
  * binary — never a token-grain join or a per-document
  * re-aggregation (the exact-df spelling of this ordering cost more
  * in token shuffles than it saved in candidates; see
  * `Dedup.jaccardJoinExact`).
  */
case class FreqOrderExpr(
    child: Expression,
    heavySorted: Array[Long],
    rankOf: Array[Int],
    tokenOfRank: Array[Long])
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  require(heavySorted.length == rankOf.length &&
    heavySorted.length == tokenOfRank.length, "token/rank tables must align")

  override def acceptedTypes: Seq[Seq[DataType]] =
    Seq(Seq(ArrayType(LongType, containsNull = false),
      ArrayType(LongType, containsNull = true)))
  override def dataType: DataType = child.dataType
  override def prettyName: String = "freq_order"

  override def nullSafeEval(input: Any): Any =
    FreqOrderOps.reorder(input.asInstanceOf[ArrayData], heavySorted, rankOf, tokenOfRank)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val heavyRef = ctx.addReferenceObj("heavySorted", heavySorted, "long[]")
    val rankRef = ctx.addReferenceObj("rankOf", rankOf, "int[]")
    val invRef = ctx.addReferenceObj("tokenOfRank", tokenOfRank, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FreqOrderOps$$.MODULE$$.reorder($c, $heavyRef, $rankRef, $invRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): FreqOrderExpr =
    copy(child = newChild)
}

object FreqOrderOps {
  /** [non-heavy ascending by signed hash] ++ [heavy by descending rank
    * index]. Null elements (declared-possible on general inputs) are
    * dropped — shingle-hash arrays are null-free in practice, matching
    * the sorted-set derivation's behavior.
    */
  def reorder(
      arr: ArrayData,
      heavySorted: Array[Long],
      rankOf: Array[Int],
      tokenOfRank: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val nonHeavy = new Array[Long](n)
    val heavyRanks = new Array[Int](n)
    var nn = 0
    var nh = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getLong(i)
        val idx = java.util.Arrays.binarySearch(heavySorted, t)
        if (idx >= 0) { heavyRanks(nh) = rankOf(idx); nh += 1 }
        else { nonHeavy(nn) = t; nn += 1 }
      }
      i += 1
    }
    java.util.Arrays.sort(nonHeavy, 0, nn)
    java.util.Arrays.sort(heavyRanks, 0, nh)
    val out = new Array[Long](nn + nh)
    System.arraycopy(nonHeavy, 0, out, 0, nn)
    // Heavy tokens appended in descending rank index = ascending df.
    var j = 0
    while (j < nh) {
      out(nn + j) = tokenOfRank(heavyRanks(nh - 1 - j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
