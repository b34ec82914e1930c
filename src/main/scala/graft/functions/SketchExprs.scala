package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.GraftExpectsInputTypes
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe into a serialized count-min sketch: returns the
  * sketch's (over-)estimate of `term`'s occurrence count.
  *
  * The sketch binary comes from Spark's own `count_min_sketch`
  * aggregate, so the hashing discipline is guaranteed consistent:
  * both the aggregate's update path and `estimateCount` hash the
  * term's UTF-8 bytes through the same murmur implementation
  * (`org.apache.spark.util.sketch.CountMinSketchImpl`).
  *
  * CodegenFallback is deliberate: the probe runs on the handful of
  * rows that survive a top-k limit (bounded k, never corpus grain), so
  * interpreted eval costs nothing and keeps the deserialization memo
  * simple. The memo caches the last deserialized sketch by array
  * reference — in the intended shape (one sketch row broadcast against
  * k probe rows) every row after the first reuses it.
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with GraftExpectsInputTypes {

  override def acceptedTypes: Seq[Seq[DataType]] =
    Seq(Seq(BinaryType), Seq(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var cachedBytes: AnyRef = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(bytes: Any, term: Any): Any = {
    val b = bytes.asInstanceOf[Array[Byte]]
    if (!(b.asInstanceOf[AnyRef] eq cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(b))
      cachedBytes = b
    }
    cachedSketch.estimateCount(term.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}
