package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftExpectsInputTypes
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TRUE iff `tok` is the SMALLEST element shared by two sorted-ascending
  * distinct arrays — the exactly-once emission test of a prefix-filter
  * similarity join ([[graft.plans.JaccardPrefixJoinRule]]): a candidate
  * pair sharing several prefix tokens must be kept at only one of them.
  *
  * The equivalent builtin form `tok = array_min(array_intersect(a, b))`
  * builds a hash set per evaluated row (ArrayIntersect is
  * CodegenFallback) and scans both arrays fully; this is a codegen'd
  * zero-allocation merge scan that stops at the FIRST shared element —
  * which, on sorted inputs, IS the minimum. It runs once per joined
  * token-pair row, the hottest row grain of the rewritten join.
  */
case class IsFirstSharedSortedExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(
    Seq(LongType, StringType),
    Seq(ArrayType(LongType), ArrayType(StringType)),
    Seq(ArrayType(LongType), ArrayType(StringType)))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_first_shared_sorted"

  private lazy val isLong: Boolean = first.dataType == LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    // Only consult element types once the base check confirmed the
    // children ARE arrays — casting first would throw on a scalar child
    // instead of returning the clean TypeCheckFailure.
    if (!base.isSuccess) base
    else if (second.dataType.asInstanceOf[ArrayType].elementType != first.dataType ||
      third.dataType.asInstanceOf[ArrayType].elementType != first.dataType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires both array element types to match the token type")
    else base
  }

  override def nullSafeEval(tok: Any, a: Any, b: Any): Any =
    if (isLong)
      SortedSetOps.isFirstSharedLong(tok.asInstanceOf[Long],
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedSetOps.isFirstSharedString(tok.asInstanceOf[UTF8String],
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, a, b) =>
      if (isLong) s"graft.functions.SortedSetOps$$.MODULE$$.isFirstSharedLong($t, $a, $b)"
      else s"graft.functions.SortedSetOps$$.MODULE$$.isFirstSharedString($t, $a, $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IsFirstSharedSortedExpr =
    copy(first = f, second = s, third = t)
}

object SortedSetOps {
  /** Merge scan of two sorted-ascending distinct long arrays: the first
    * element found in both is the minimum shared one; compare it to tok.
    */
  def isFirstSharedLong(tok: Long, a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) return x == tok
      else if (x < y) i += 1
      else j += 1
    }
    false
  }

  def isFirstSharedString(tok: UTF8String, a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) return x.compareTo(tok) == 0
      else if (c < 0) i += 1
      else j += 1
    }
    false
  }
}
