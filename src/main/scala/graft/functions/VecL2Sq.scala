package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, GraftExpectsInputTypes}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native squared-L2 distance over numeric vectors — the k-means /
  * product-quantization inner loop ([[graft.ops.ProductQuantize]]
  * evaluates it store-rows x ksub times per Lloyd round and per
  * encode).
  *
  * Semantics match the HOF composition
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`
  * branch-for-branch: any null element -> null, length mismatch ->
  * null (zip_with null-pads, and the lambda nulls poison the fold),
  * else the left-to-right sum of squared differences (identical double
  * association order to the fold, so swapping implementations cannot
  * move a single bit).
  *
  * Why native: the HOF form materializes a zip_with intermediate array
  * and dispatches a lambda per element per pair — at 100x bench scale
  * the PQ argmin evaluates ~13M pairs, so the allocation is the hot
  * loop. This is one fused primitive pass inside whole-stage codegen,
  * the [[VecCosineExpr]] pattern.
  */
case class VecL2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression with GraftExpectsInputTypes {

  override def acceptedTypes: Seq[Seq[DataType]] = {
    val vec = Seq[DataType](ArrayType(FloatType), ArrayType(DoubleType))
    Seq(vec, vec)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2sq"
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecL2SqOps.l2sqBoxed(a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double graft_l2_r = graft.functions.VecL2SqOps$$.MODULE$$.l2sqBoxed(
         |  $a, ${elemIsFloat(left)}, $b, ${elemIsFloat(right)});
         |if (graft_l2_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft_l2_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2SqExpr =
    copy(left = newLeft, right = newRight)
}

object VecL2SqOps {
  /** Null element or length mismatch -> null, else the ascending-index
    * fold of (x-y)^2 (the HOF's exact association order).
    */
  def l2sqBoxed(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb) return null
    var acc = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  /** Column-facing API. */
  def vecL2SqNative(a: Column, b: Column): Column =
    Bridge.column(VecL2SqExpr(Bridge.expression(a), Bridge.expression(b)))
}
