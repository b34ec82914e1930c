package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** F3 `duration_to_seconds`: ISO-8601 duration (`P[nD]T[nH][nM][nS]`) ->
  * total seconds; null / unparsable / empty -> 0 (the reference returns 0
  * rather than null — extractors/utils/helpers/youtube.py:33-41).
  *
  * Native Catalyst Expression with codegen (static call into the parser)
  * so it stays inside whole-stage codegen on the scan path.
  */
case class IsoDurationSecondsExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[org.apache.spark.sql.types.DataType]] =
    Seq(Seq(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "iso_duration_seconds"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else IsoDurationSeconds.parse(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val parser = "graft.functions.IsoDurationSeconds$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L : $parser.parse(${c.value}.toString());""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): IsoDurationSecondsExpr =
    copy(child = newChild)
}

object IsoDurationSeconds {
  private val Pattern =
    "^P(?:(\\d+)D)?(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d+)?)S)?)?$".r

  /** Parse a `P[nD][T[nH][nM][nS]]` duration; anything else -> 0. */
  def parse(s: String): Long = {
    if (s == null) return 0L
    Pattern.findFirstMatchIn(s.trim) match {
      case Some(m) if Seq(1, 2, 3, 4).exists(m.group(_) != null) =>
        val d  = Option(m.group(1)).map(_.toLong).getOrElse(0L)
        val h  = Option(m.group(2)).map(_.toLong).getOrElse(0L)
        val mi = Option(m.group(3)).map(_.toLong).getOrElse(0L)
        val se = Option(m.group(4)).map(_.toDouble).getOrElse(0.0)
        d * 86400 + h * 3600 + mi * 60 + se.toLong
      case _ => 0L
    }
  }

  /** Column-facing API: `iso_duration_seconds($"dur")`. */
  def isoDurationSeconds(c: Column): Column =
    Bridge.column(IsoDurationSecondsExpr(Bridge.expression(c)))
}
