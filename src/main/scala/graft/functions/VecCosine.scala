package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine-similarity Catalyst expression over `array<float>` /
  * `array<double>` vectors (SURVEY.md §4.2's declared perf upgrade for
  * O5). Semantics match the HOF composition in [[VectorFunctions]]
  * exactly — dot over the common prefix, norms over each full array,
  * all math in double, zero-norm -> 0.0 — so swapping it in cannot
  * change oracle hashes.
  *
  * Why native: the HOF form builds zip_with/transform intermediate
  * arrays and evaluates a lambda per element; this is one tight
  * primitive loop per row (no allocation), inside whole-stage codegen
  * via a static call — the same pattern as [[IsoDurationSecondsExpr]].
  */
case class VecCosineExpr(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[org.apache.spark.sql.types.DataType]] = {
    val vec = Seq[org.apache.spark.sql.types.DataType](
      ArrayType(FloatType), ArrayType(DoubleType))
    Seq(vec, vec)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // Length mismatch or any null element -> null, mirroring the HOF form
  // exactly (zip_with null-pads the shorter side and a null element
  // nulls the whole fold).
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]; val bd = b.asInstanceOf[ArrayData]
    if (ad.numElements() != bd.numElements()) null
    else VecCosineOps.cosineBoxed(ad, elemIsFloat(left), bd, elemIsFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.lang.Double graft_vc_r = graft.functions.VecCosineOps$$.MODULE$$.cosineBoxed(
         |    $a, ${elemIsFloat(left)}, $b, ${elemIsFloat(right)});
         |  if (graft_vc_r == null) { ${ev.isNull} = true; }
         |  else { ${ev.value} = graft_vc_r.doubleValue(); }
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosineExpr =
    copy(left = newLeft, right = newRight)
}

object VecCosineOps {
  /** One-pass cosine over equal-length vectors; null when any element
    * is null (matching the HOF fold). The expression handles the
    * length-mismatch null before calling this.
    */
  def cosineBoxed(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var dot = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; sa += x * x; sb += y * y
      i += 1
    }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Column-facing API. */
  def vecCosineNative(a: Column, b: Column): Column =
    Bridge.column(VecCosineExpr(Bridge.expression(a), Bridge.expression(b)))
}
