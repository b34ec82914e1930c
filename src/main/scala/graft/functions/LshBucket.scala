package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, GraftExpectsInputTypes}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sign-pattern LSH bucket id over an embedding column: bit `p`
  * of the result is set iff the dot product of the vector with
  * deterministic pseudo-random hyperplane `p` is >= 0. This is the
  * bucketing key behind [[graft.ops.Similarity.lshTopK]],
  * [[graft.ops.Dedup.embeddingNearDuplicatesLsh]] and
  * [[graft.plans.CosineBandJoinRule]].
  *
  * Why native: the previous HOF composition (one
  * `aggregate(zip_with(...))` fold per plane) is CodegenFallback —
  * interpreted per row, re-evaluated per plan reference, and it
  * allocates two intermediate arrays per plane. This is one JIT'd
  * primitive loop over planes x dims via a static call, inside
  * whole-stage codegen, with the plane matrix built once per JVM.
  *
  * Semantics are bit-identical to the HOF form for the only shape it
  * was defined on (array length == the hyperplane dim): same
  * `MurmurHash3.productHash((plane, d)) / Int.MaxValue` components,
  * same double accumulation order, same `>= 0.0` sign test. Edge
  * parity: a null array or any null element makes every HOF plane-dot
  * null, which `when(...).otherwise(0)` turns into an all-zero bucket
  * — reproduced here (never returns null). The hyperplane components
  * for index d are derived per element, so the effective dim is the
  * array's own length (the HOF form instead null-padded against its
  * fixed-dim literal plane — an all-zero bucket; no caller mixes dims,
  * and deriving-from-length is what lets the optimizer rule apply
  * without schema knowledge).
  */
case class LshBucketExpr(child: Expression, numPlanes: Int)
    extends UnaryExpression with GraftExpectsInputTypes {
  require(numPlanes >= 1 && numPlanes <= 62, "numPlanes in [1, 62]")
  override def acceptedTypes: Seq[Seq[DataType]] =
    Seq(Seq(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_bucket"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshBucketOps.bucket(v.asInstanceOf[ArrayData], elemIsFloat, numPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.LshBucketOps$$.MODULE$$.bucket(
            ${c.value}, $elemIsFloat, $numPlanes);
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketOps {

  /** Deterministic pseudo-random hyperplane component for (plane, d) —
    * the same derivation [[graft.ops.Similarity]] has always used, so
    * native and HOF buckets agree bit-for-bit.
    */
  private def planeComponent(plane: Int, d: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((plane, d))
    h.toDouble / Int.MaxValue.toDouble
  }

  // Plane matrices are tiny (numPlanes x dim doubles) and immutable —
  // built once per (numPlanes, dim) per JVM, shared across threads.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((numPlanes, dim),
      _ => Array.tabulate(numPlanes, dim)((p, d) => planeComponent(p, d)))

  /** Sign-pattern bucket: one pass over planes x dims, no allocation
    * beyond the cached plane matrix. Null element -> all-zero bucket
    * (HOF parity; see [[LshBucketExpr]]).
    */
  def bucket(a: ArrayData, isFloat: Boolean, numPlanes: Int): Long = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L
      i += 1
    }
    val pl = planes(numPlanes, n)
    var out = 0L
    var p = 0
    while (p < numPlanes) {
      val row = pl(p)
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += (if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)) * row(d)
        d += 1
      }
      if (dot >= 0.0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Column-facing API. */
  def lshBucketNative(emb: Column, numPlanes: Int): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(emb), numPlanes))
}
