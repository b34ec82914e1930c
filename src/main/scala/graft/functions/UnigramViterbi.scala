package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM VITERBI segmentation of ONE word (Kudo 2018,
  * "Subword Regularization" §3.2 — the SentencePiece default used by
  * the T5/Llama-family pipelines): split the word into vocabulary
  * pieces minimizing the total piece cost, where cost(p) is the
  * piece's negative log-probability on graft's exact micro-nat grid
  * (see [[graft.ops.Unigram]] — the q82 LanguageModel discipline, so
  * the whole DP runs on BIGINT sums both here and in the DuckDB
  * oracle's replay).
  *
  * Semantics contract (mirrored by the oracle's unrolled DP CTEs):
  *  - positions/lengths count CODE POINTS; pieces are at most
  *    `maxPieceLen` code points (the training substring cap);
  *  - words longer than `maxChars` code points are [UNK] wholesale,
  *    as are words with NO segmentation (reachable: a code point the
  *    vocabulary lacks) — the WordPiece [UNK]-wholesale discipline;
  *  - DP tie-break, applied at every position: minimal total cost,
  *    then minimal piece count, then the LONGEST last piece. Because
  *    the forward pass always stores the winning predecessor, the
  *    backtracked segmentation equals the forward-carried one — the
  *    oracle carries the piece list forward in its DP state and must
  *    agree (UnigramSpec pins a structural tie: "aaa" under
  *    {a, aa} with cost(aa) < 2*cost(a) has two (cost, pieces)-equal
  *    splits a+aa / aa+a; longest-last picks a+aa).
  */
case class UnigramViterbiExpr(child: Expression,
    pieces: Seq[(String, Long)], maxChars: Int, maxPieceLen: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi"

  @transient private lazy val table =
    UnigramViterbiOps.tableFor(pieces, maxChars, maxPieceLen)

  override def nullSafeEval(input: Any): Any =
    UnigramViterbiOps.segmentWord(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The piece LIST is the codegen reference (java-serialized per
    // task); tableFor at generated-class init lands every task on the
    // one JVM-shared Table — the WordPieceTokenizeExpr discipline.
    val piecesRef = ctx.addReferenceObj("ugPieces", pieces,
      "scala.collection.immutable.Seq")
    val tableVar = ctx.addMutableState(
      classOf[UnigramViterbiOps.Table].getName, "ugTable",
      v => s"$v = graft.functions.UnigramViterbiOps$$.MODULE$$.tableFor(" +
        s"(scala.collection.immutable.Seq) $piecesRef, $maxChars, $maxPieceLen);")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramViterbiOps$$.MODULE$$.segmentWord($c, $tableVar)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramViterbiExpr = copy(child = newChild)
}

object UnigramViterbiOps {

  val Unk = "[UNK]"
  private val unkArray: Array[AnyRef] = Array(UTF8String.fromString(Unk))

  final class Table(val costs: Map[String, Long], val maxChars: Int,
      val maxPieceLen: Int) extends Serializable {
    @transient lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[AnyRef]]()
  }

  private val tables = new java.util.concurrent.ConcurrentHashMap[
    (Seq[(String, Long)], Int, Int), Table]()

  def tableFor(pieces: Seq[(String, Long)], maxChars: Int,
      maxPieceLen: Int): Table = {
    if (tables.size() > 64) tables.clear()
    tables.computeIfAbsent((pieces, maxChars, maxPieceLen),
      k => new Table(k._1.toMap, k._2, k._3))
  }

  def segmentWord(word: UTF8String, table: Table): ArrayData = {
    val cache = table.cache
    val w = word.toString
    var toks = cache.get(w)
    if (toks == null) {
      toks = viterbi(w, table)
      if (cache.size() > 4000000) cache.clear()
      cache.putIfAbsent(w, toks)
    }
    new GenericArrayData(toks)
  }

  private def viterbi(w: String, table: Table): Array[AnyRef] = {
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty[AnyRef]
    if (n > table.maxChars) return unkArray
    val NoCost = Long.MaxValue
    val cost = Array.fill(n + 1)(NoCost)
    val nPieces = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(0)
    cost(0) = 0; nPieces(0) = 0
    var k = 1
    while (k <= n) {
      var l = 1
      val lMax = math.min(k, table.maxPieceLen)
      while (l <= lMax) {
        if (cost(k - l) != NoCost) {
          val piece = new String(cps, k - l, l)
          table.costs.get(piece) match {
            case Some(pc) =>
              val c = cost(k - l) + pc
              val p = nPieces(k - l) + 1
              // (cost asc, pieces asc, L desc): strict improvement,
              // or an exact (cost, pieces) tie won by the longer piece.
              val better = c < cost(k) ||
                (c == cost(k) && (p < nPieces(k) ||
                  (p == nPieces(k) && l > back(k))))
              if (better) { cost(k) = c; nPieces(k) = p; back(k) = l }
            case None => ()
          }
        }
        l += 1
      }
      k += 1
    }
    if (cost(n) == NoCost) return unkArray
    val out = new Array[AnyRef](nPieces(n))
    var pos = n
    var i = nPieces(n) - 1
    while (pos > 0) {
      val l = back(pos)
      out(i) = UTF8String.fromString(new String(cps, pos - l, l))
      pos -= l
      i -= 1
    }
    out
  }
}
