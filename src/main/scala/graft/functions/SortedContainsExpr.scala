package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftExpectsInputTypes
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Membership test against a SORTED ascending bigint array by binary
  * search — O(log n) per probe where `array_contains` scans linearly.
  * The fast path of broadcast-set filters (the [[graft.ops.Boilerplate]]
  * map-only form probes each of a document's lines against the
  * corpus's boilerplate hash set: with a binary search the set can be
  * six figures wide before the linear scan's per-line cost would argue
  * for the shuffle-join form instead).
  *
  * PRECONDITION (caller-owned, not rechecked): the array is sorted
  * ascending with no nulls — the producer is always a
  * `sort_array(collect_set(...))` over xxhash64 values. Probing an
  * unsorted array returns garbage, exactly like `java.util.Arrays
  * .binarySearch`. Null array or null key -> null (standard binary
  * expression null semantics).
  */
case class SortedContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] =
    Seq(Seq(ArrayType(LongType)), Seq(LongType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_contains"
  override def nullSafeEval(arr: Any, key: Any): Any =
    SortedContainsOps.contains(arr.asInstanceOf[ArrayData],
      key.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, k) =>
      s"graft.functions.SortedContainsOps$$.MODULE$$.contains($a, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedContainsExpr =
    copy(left = newLeft, right = newRight)
}

object SortedContainsOps {
  /** Binary search directly over ArrayData (no per-row copy — getLong
    * on unsafe/generic array data is O(1)).
    */
  def contains(arr: ArrayData, key: Long): Boolean = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = arr.getLong(mid)
      if (v == key) return true
      if (v < key) lo = mid + 1 else hi = mid - 1
    }
    false
  }
}
