package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftExpectsInputTypes
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two string arrays AS SETS (duplicates ignored,
  * like `array_intersect`/`array_union`): |a ∩ b| / |a ∪ b|, 0.0 when
  * both are empty. Native one-pass form of
  * `size(array_intersect)/size(array_union)` — those builtins are
  * CodegenFallback (hash-set per row per op, no common-subexpression
  * elimination, so a jaccard referenced by both a filter and a
  * projection paid the set construction twice); this computes
  * |∪| = |setA| + |distinct(b)| - |∩| from one membership set.
  */
case class JaccardSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] = {
    val arr = Seq[DataType](ArrayType(StringType), ArrayType(LongType))
    Seq(arr, arr)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  private lazy val isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (left.dataType.asInstanceOf[ArrayType].elementType !=
      right.dataType.asInstanceOf[ArrayType].elementType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires both arrays to share an element type")
    else base
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      JaccardSimOps.jaccardLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else JaccardSimOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      if (isLong) s"graft.functions.JaccardSimOps$$.MODULE$$.jaccardLong($a, $b)"
      else s"graft.functions.JaccardSimOps$$.MODULE$$.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimExpr =
    copy(left = newLeft, right = newRight)
}

object JaccardSimOps {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val setA = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { setA.add(a.getUTF8String(i)); i += 1 }
    // Distinct b while counting intersections, so duplicate elements on
    // either side cannot skew the ratio.
    val seenB = new java.util.HashSet[UTF8String](nb * 2)
    var inter = 0
    i = 0
    while (i < nb) {
      val e = b.getUTF8String(i)
      if (seenB.add(e) && setA.contains(e)) inter += 1
      i += 1
    }
    inter.toDouble / (setA.size + seenB.size - inter).toDouble
  }

  /** Long-element variant (hashed shingle sets). */
  def jaccardLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val setA = new java.util.HashSet[java.lang.Long](na * 2)
    var i = 0
    while (i < na) { setA.add(a.getLong(i)); i += 1 }
    val seenB = new java.util.HashSet[java.lang.Long](nb * 2)
    var inter = 0
    i = 0
    while (i < nb) {
      val e: java.lang.Long = b.getLong(i)
      if (seenB.add(e) && setA.contains(e)) inter += 1
      i += 1
    }
    inter.toDouble / (setA.size + seenB.size - inter).toDouble
  }
}
