package graft.chunk

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** G1 chunker as a Catalyst `Generator` (SURVEY.md §7.3 "promote to
  * Generator for SQL surface"): `chunk_transcript(snippets, size,
  * overlap)` expands one transcript row into its chunk rows — the SQL
  * counterpart of [[ChunkTranscript.chunkDF]]'s typed flatMap, sharing
  * [[ChunkSplitter.chunkTranscript]] so the two surfaces cannot drift.
  *
  * Scale shape is identical to the typed path: per-row generation
  * inside the task that read the row (Spark plans a `Generate` node) —
  * no shuffle, linear in input splits.
  *
  * Input: `array<struct<...>>` with fields `text: string`,
  * `start: double`, `duration: double` resolved by NAME, so any field
  * order works. Null array -> no rows; null snippet elements are
  * skipped; null text/start/duration default to ""/0.0 (the typed path
  * rejects those rows at encoding time instead).
  */
case class ChunkTranscriptGen(child: Expression, chunkSize: Int, chunkOverlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "chunk_transcript"

  override def elementSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("start", DoubleType, nullable = false)))

  private lazy val snippetType: StructType = child.dataType match {
    case ArrayType(st: StructType, _) => st
    case other => throw new IllegalStateException(s"unresolved input type $other")
  }
  private lazy val textOrd = snippetType.fieldIndex("text")
  private lazy val startOrd = snippetType.fieldIndex("start")
  private lazy val durOrd = snippetType.fieldIndex("duration")

  override def checkInputDataTypes(): TypeCheckResult = {
    def has(st: StructType, name: String, dt: DataType): Boolean =
      st.fields.exists(f => f.name == name && f.dataType == dt)
    child.dataType match {
      case ArrayType(st: StructType, _)
          if has(st, "text", StringType) && has(st, "start", DoubleType) &&
             has(st, "duration", DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<struct> with text: string, start: double, " +
          s"duration: double fields, got ${other.catalogString}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Iterator.empty
    else {
      val arr = data.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val snippets = Vector.newBuilder[Snippet]
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val r = arr.getStruct(i, snippetType.length)
          snippets += Snippet(
            if (r.isNullAt(textOrd)) "" else r.getUTF8String(textOrd).toString,
            if (r.isNullAt(startOrd)) 0.0 else r.getDouble(startOrd),
            if (r.isNullAt(durOrd)) 0.0 else r.getDouble(durOrd))
        }
        i += 1
      }
      ChunkSplitter.chunkTranscript(snippets.result(), chunkSize, chunkOverlap)
        .iterator.map(c => InternalRow(UTF8String.fromString(c.text), c.start))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkTranscriptGen =
    copy(child = newChild)
}

object ChunkTranscriptGen {
  /** Column-facing surface: expands into (text, start) columns, like
    * `explode`.
    */
  def chunkTranscriptGen(snippets: Column, chunkSize: Int = 1000, chunkOverlap: Int = 200): Column =
    Bridge.column(ChunkTranscriptGen(Bridge.expression(snippets), chunkSize, chunkOverlap))
}
