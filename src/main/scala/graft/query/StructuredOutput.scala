package graft.query

import graft.external.{AgentAnswer, Answerer, ContextDoc, ParsedQuery}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read parsing of structured LLM output (SURVEY.md §1.3).
  *
  * The reference binds LLM responses to Pydantic models via LangChain's
  * `PydanticOutputParser` (kfai/loaders/utils/parsing.py:17-66, models at
  * kfai/loaders/utils/types.py:47-109): `QueryParseResponse` for the
  * query-parsing call and `AgentResponse{query_response, sources[]}` for
  * the answer call, with any parse failure collapsing to None. The Spark
  * re-expression is `from_json` with an explicit schema — a codegen'd
  * column operation, so a pipeline that stores millions of raw LLM
  * responses parses them distributed, not row-at-a-time on a driver:
  *
  *  - fence/preamble recovery: LangChain tolerates reasoning preambles
  *    and ```json fences around the object; [[extractJson]] mirrors that
  *    by taking the outermost `{...}` span (greedy, dotall).
  *  - malformed JSON -> null fields (from_json PERMISSIVE), the
  *    column-level analog of parse_query's `except -> None`.
  *  - missing keys -> null fields, like Pydantic's defaults-on-absence.
  */
object StructuredOutput {

  /** `SourceCitation` (types.py:90-99). */
  val sourceCitationSchema: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("start_time", DoubleType)))

  /** `AgentResponse` (types.py:100-109). */
  val agentResponseSchema: StructType = StructType(Seq(
    StructField("query_response", StringType),
    StructField("sources", ArrayType(sourceCitationSchema))))

  /** `QueryParseResponse` (types.py:47-87) — year fields are strings in
    * the reference model (the parser normalizes them downstream).
    */
  val queryParseSchema: StructType = StructType(Seq(
    StructField("shows", ArrayType(StringType)),
    StructField("hosts", ArrayType(StringType)),
    StructField("topics", ArrayType(StringType)),
    StructField("exact_year", StringType),
    StructField("year_range", StringType),
    StructField("before_year", StringType),
    StructField("after_year", StringType)))

  /** Outermost `{...}` span of a raw LLM response (greedy, dotall) —
    * recovers the JSON object from reasoning preambles and markdown
    * fences the way LangChain's JSON parser does. No-match -> '' ->
    * null after from_json.
    */
  def extractJson(c: Column): Column = regexp_extract(c, "(?s)\\{.*\\}", 0)

  /** Raw answer text -> `AgentResponse` struct column (null fields on
    * malformed input).
    */
  def parseAgentResponse(c: Column): Column =
    from_json(extractJson(c), agentResponseSchema)

  /** Raw parser-LLM text -> `QueryParseResponse` struct column. */
  def parseQueryResponse(c: Column): Column =
    from_json(extractJson(c), queryParseSchema)

  // Expression-level forms for the SQL function registry (a
  // registry builder must return a plain Catalyst expression tree —
  // bridging a functions-API Column back produces an unresolved
  // column node that cannot codegen).
  import org.apache.spark.sql.catalyst.expressions.{Expression, JsonToStructs, Literal, RegExpExtract}

  private def extractJsonExpr(e: Expression): Expression =
    RegExpExtract(e, Literal("(?s)\\{.*\\}"), Literal(0))

  def parseAgentResponseExpr(e: Expression): Expression =
    JsonToStructs(agentResponseSchema, Map.empty, extractJsonExpr(e))

  def parseQueryResponseExpr(e: Expression): Expression =
    JsonToStructs(queryParseSchema, Map.empty, extractJsonExpr(e))

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.TimeZoneAwareExpression
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** Evaluate one of the shared parse expressions directly against a
    * string literal — interpreted Catalyst eval on the driver, NO Spark
    * job (the previous one-row-Dataset form launched two jobs per
    * serving-path query just to parse two strings). The expression tree
    * is the SAME builder the SQL registry and column path use, so
    * driver and distributed parses cannot diverge; a unit test pins
    * them byte-for-byte. Timezone-aware nodes get the session-default
    * zone (the parse schemas carry no timestamp fields, so the zone
    * never affects the result).
    */
  private def evalShared(
      build: Expression => Expression, raw: String): InternalRow = {
    val expr = build(Literal(UTF8String.fromString(raw), StringType))
      .transformUp {
        case t: TimeZoneAwareExpression if t.timeZoneId.isEmpty =>
          t.withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      }
    expr.eval(InternalRow.empty).asInstanceOf[InternalRow]
  }

  /** Driver-side single-response parse into the typed [[AgentAnswer]],
    * for the QueryEngine's answer boundary. Evaluates the SAME Catalyst
    * expression as the column path (direct interpreted eval, no job),
    * so driver and distributed parses cannot diverge. Parse failure ->
    * None, like the reference's `except -> None`; a sources array with
    * schema-invalid ELEMENTS (null / missing citation fields) is
    * likewise None, while a sources value that is not an array of
    * objects at all collapses to null under from_json PERMISSIVE and
    * parses as answer-without-citations (divergence from Pydantic's
    * hard error — the column representation cannot distinguish it from
    * an absent key).
    */
  def toAgentAnswer(raw: String): Option[AgentAnswer] = {
    val row = evalShared(parseAgentResponseExpr, raw)
    if (row == null || row.isNullAt(0)) None
    else {
      val resp = row.getUTF8String(0).toString
      val srcs: Seq[InternalRow] =
        if (row.isNullAt(1)) Seq.empty
        else {
          val a = row.getArray(1)
          (0 until a.numElements()).map(i =>
            if (a.isNullAt(i)) null else a.getStruct(i, 2))
        }
      // A source element that failed the struct schema (null element,
      // null video_id/start_time) is Pydantic's ValidationError -> None,
      // not a crash.
      if (srcs.forall(s => s != null && !s.isNullAt(0) && !s.isNullAt(1)))
        Some(AgentAnswer(resp,
          srcs.map(s => (s.getUTF8String(0).toString, s.getDouble(1).toInt))))
      else None
    }
  }

  /** Driver-side single-response parse into [[ParsedQuery]] (year
    * strings -> Ints where numeric; "a-b" range split), mirroring the
    * reference's post-Pydantic normalization. Direct expression eval —
    * no Spark job, no session needed.
    */
  def toParsedQuery(raw: String): Option[ParsedQuery] = {
    val row = evalShared(parseQueryResponseExpr, raw)
    def strs(i: Int): Seq[String] =
      if (row.isNullAt(i)) Seq.empty
      else {
        val a = row.getArray(i)
        (0 until a.numElements()).map(j =>
          if (a.isNullAt(j)) null else a.getUTF8String(j).toString)
      }
    def str(i: Int): Option[String] =
      if (row.isNullAt(i)) None else Some(row.getUTF8String(i).toString)
    def year(i: Int): Option[Int] = str(i).flatMap(s => s.trim.toIntOption)
    if (row == null) return None
    val range = str(4).flatMap { s =>
      s.split("-", 2) match {
        case Array(a, b) => for (x <- a.trim.toIntOption; y <- b.trim.toIntOption) yield (x, y)
        case _ => None
      }
    }
    if ((0 until 7).forall(row.isNullAt)) None
    else Some(ParsedQuery(
      shows = strs(0), hosts = strs(1), topics = strs(2),
      exactYear = year(3), yearRange = range,
      beforeYear = year(5), afterYear = year(6)))
  }
}

/** Adapter from a raw-text LLM boundary — `(query, context) -> response
  * text` — to the typed [[Answerer]], via [[StructuredOutput]]'s
  * schema-on-read parse. An unparsable response throws, matching the
  * reference's un-guarded `qa_chain.invoke` (query_agent.py:330-341,
  * where a Pydantic parse failure propagates to the caller).
  */
class JsonAnswerer(
    raw: (String, Seq[ContextDoc]) => String) extends Answerer {
  override def answer(query: String, context: Seq[ContextDoc]): AgentAnswer =
    StructuredOutput.toAgentAnswer(raw(query, context)).getOrElse(
      throw new IllegalArgumentException(
        s"LLM answer did not parse as AgentResponse for query: $query"))
}
