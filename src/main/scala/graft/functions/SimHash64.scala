package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash over a token-hash array as a native Catalyst
  * expression: one tight loop maintaining 64 vote counters per row.
  *
  * The HOF form (fold with a 64-long array accumulator) allocates a new
  * 64-element array per token in interpreted eval; this is a JIT'd
  * primitive loop with a stack-local counter array — the per-document
  * cost drops from thousands of interpreted expression evaluations to
  * ~tokens*64 integer ops.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[org.apache.spark.sql.types.DataType]] =
    Seq(Seq(org.apache.spark.sql.types.ArrayType(LongType)))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashOps.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashOps$$.MODULE$$.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHashOps {
  /** Per bit b: set when more than half the hashes have bit b set
    * (sign of the +1/-1 vote sum). Null elements count as absent.
    */
  def simhash(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](64)
    var i = 0
    var total = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1
          b += 1
        }
        total += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) * 2 > total) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-facing API over an `array<long>` of token hashes. */
  def simhash64FromHashes(hashes: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(hashes)))
}
