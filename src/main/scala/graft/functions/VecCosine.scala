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
  * exactly — norms over each full array, all math in double, and the
  * same branch order as `when(denom === 0, 0.0).otherwise(dot/denom)`:
  * a null element anywhere -> null, else zero denom -> 0.0 (even when
  * lengths mismatch), else length mismatch -> null (zip_with null-pads
  * the dot), else dot/denom — so swapping it in cannot change oracle
  * hashes.
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

  // Null element -> null; zero denom -> 0.0; length mismatch -> null —
  // the HOF form's branch order (see scaladoc). All edge handling lives
  // in cosineBoxed so eval and codegen cannot drift.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecCosineOps.cosineBoxed(a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double graft_vc_r = graft.functions.VecCosineOps$$.MODULE$$.cosineBoxed(
         |  $a, ${elemIsFloat(left)}, $b, ${elemIsFloat(right)});
         |if (graft_vc_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft_vc_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosineExpr =
    copy(left = newLeft, right = newRight)
}

object VecCosineOps {
  /** Cosine with the HOF form's exact branch order: null element ->
    * null, else denom == 0 -> 0.0 (wins even on length mismatch — the
    * norms come from full per-array folds), else length mismatch ->
    * null (zip_with null-pads the dot), else dot/denom. Equal-length
    * arrays take a single fused pass.
    */
  def cosineBoxed(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == nb) {
      var dot = 0.0; var sa = 0.0; var sb = 0.0
      var i = 0
      while (i < na) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; sa += x * x; sb += y * y
        i += 1
      }
      val denom = math.sqrt(sa) * math.sqrt(sb)
      if (denom == 0.0) 0.0 else dot / denom
    } else {
      // Mismatched lengths: the HOF's dot is null, but its denom==0
      // branch still fires first when either full-array norm is zero.
      var sa = 0.0; var i = 0
      while (i < na) {
        if (a.isNullAt(i)) return null
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        sa += x * x; i += 1
      }
      var sb = 0.0; i = 0
      while (i < nb) {
        if (b.isNullAt(i)) return null
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        sb += y * y; i += 1
      }
      if (math.sqrt(sa) * math.sqrt(sb) == 0.0) 0.0 else null
    }
  }

  /** Column-facing API. */
  def vecCosineNative(a: Column, b: Column): Column =
    Bridge.column(VecCosineExpr(Bridge.expression(a), Bridge.expression(b)))
}
