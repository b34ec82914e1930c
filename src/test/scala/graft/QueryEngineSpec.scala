package graft

import graft.external._
import graft.query.{FilterSpec, QueryEngine}
import org.apache.spark.sql.functions._

/** §3.3 lifecycle test: parse(stub) -> filter -> hybrid+vector retrieval
  * -> merge -> answer(stub) -> citation join -> render.
  */
class QueryEngineSpec extends SparkSpec {
  import spark.implicits._

  private val embedder = new HashEmbedder(dim = 16)

  private def store() = {
    val rows = Seq(
      // (video_id, show_name, hosts, title, published_at, start_time, text)
      ("v1", "Alpha Show", "ana,common", "Spark basics", 1577836800L, 10.0, "intro to spark engines"),
      ("v1", "Alpha Show", "ana,common", "Spark basics", 1577836800L, 20.0, "catalyst optimizer details"),
      ("v2", "Beta Show", "bob", "Cooking pasta", 1609459200L, 5.0, "boil the water first"),
      ("v3", "Alpha Show", "ana", "Spark advanced", 1640995200L, 3.0, "tungsten codegen internals"))
    val withVec = rows.map { case (v, s, h, t, p, st, tx) =>
      (v, s, h, t, p, st, tx, embedder.embed(Seq(tx)).head)
    }
    withVec.toDF("video_id", "show_name", "hosts", "title",
      "published_at", "start_time", "text", "embedding")
  }

  private val parser = new DictionaryQueryParser(
    knownShows = Seq("Alpha Show", "Beta Show"), knownHosts = Seq("ana", "bob"))

  test("filter compilation: years + show + host narrow the store") {
    val engine = new QueryEngine(store(), parser, new EchoAnswerer(), embedder)
    val pq = parser.parse("""what did ana say on Alpha Show in 2020 about "spark"?""")
    assert(pq.shows == Seq("Alpha Show"))
    assert(pq.hosts == Seq("ana"))
    assert(pq.topics == Seq("spark"))
    assert(pq.exactYear.contains(2020))
    val spec = engine.buildFilter(pq).get
    val filtered = store().where(graft.query.FilterSpec.compile(spec))
    // only v1 rows are Alpha Show + ana + published in 2020
    assert(filtered.select("video_id").distinct().as[String].collect().toSeq == Seq("v1"))
  }

  test("year-filter goldens match reference build_filter (test_filtering.py)") {
    val engine = new QueryEngine(store(), parser, new EchoAnswerer(), embedder)
    def epoch(s: String): Long =
      java.time.LocalDateTime.parse(s).toEpochSecond(java.time.ZoneOffset.UTC)
    def bounds(pq: ParsedQuery, nowYear: Int = 2024): (Long, Long) = {
      val FilterSpec.And(parts) = engine.buildFilter(pq, nowYear).get: @unchecked
      val g = parts.collectFirst { case FilterSpec.Gte("published_at", v: Long) => v }.get
      val l = parts.collectFirst { case FilterSpec.Lte("published_at", v: Long) => v }.get
      (g, l)
    }
    assert(bounds(ParsedQuery(exactYear = Some(2023))) ==
      ((epoch("2023-01-01T00:00:00"), epoch("2023-12-31T23:59:59"))))
    assert(bounds(ParsedQuery(yearRange = Some((2020, 2022)))) ==
      ((epoch("2020-01-01T00:00:00"), epoch("2022-12-31T23:59:59"))))
    assert(bounds(ParsedQuery(beforeYear = Some(2019))) ==
      ((1325376000L, epoch("2018-12-31T23:59:59"))))
    assert(bounds(ParsedQuery(afterYear = Some(2022)), nowYear = 2024) ==
      ((epoch("2023-01-01T00:00:00"), epoch("2024-12-31T23:59:59"))))
  }

  test("retrieve: topic hybrid search returns display-sorted rows") {
    val engine = new QueryEngine(store(), parser, new EchoAnswerer(), embedder)
    val out = engine.retrieve("""tell me about "spark" please""")
    val ids = out.select("video_id", "start_time").as[(String, Double)].collect().toSeq
    // hybrid ILIKE on title/text matches v1 (title) and v3 (title); sorted
    // by (published_at, video_id, start_time)
    assert(ids == Seq(("v1", 10.0), ("v1", 20.0), ("v3", 3.0)))
  }

  test("parser resolves host aliases to canonical names (PRIMARY_HOST_MAP shape)") {
    val p = new DictionaryQueryParser(Nil, Seq("ana arbol"),
      hostAliases = Map("ana" -> "ana arbol", "banana" -> "ana arbol"))
    assert(p.parse("what did banana say?").hosts == Seq("ana arbol"))
    // direct + alias hits dedupe to one canonical entry
    assert(p.parse("ana arbol on things").hosts == Seq("ana arbol"))
  }

  test("retrieve: no filter and no topics searches nothing (reference None)") {
    val engine = new QueryEngine(store(), parser, new EchoAnswerer(), embedder)
    assert(engine.retrieve("completely unconstrained question").count() == 0)
  }

  test("process: echo answerer citations flow through J7/A4 and render") {
    val engine = new QueryEngine(store(), parser, new EchoAnswerer(maxCitations = 2), embedder)
    val (answer, citations) = engine.process("""anything on "spark"?""")
    assert(answer.sources.nonEmpty)
    val rows = citations.collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.getAs[String]("video_href").startsWith("https://www.youtube.com/watch?v="))
    assert(r.getAs[String]("thumbnail_src").endsWith("/mqdefault.jpg"))
    val refs: collection.Seq[org.apache.spark.sql.Row] =
      r.getAs[collection.Seq[org.apache.spark.sql.Row]]("references")
    assert(refs.nonEmpty)
    val ref0 = refs.head
    // timestamp_sec carries the +10 buffer; formatted_time renders the RAW t
    assert(ref0.getAs[String]("timestamp_href").contains(s"&t=${ref0.getAs[Long]("timestamp_sec")}s"))
    assert(ref0.getAs[String]("formatted_time").matches("\\d+:\\d{2}(:\\d{2})?"))
    // videos ordered by release date
    val pubs = rows.map(_.getAs[Long]("published_at")).toSeq
    assert(pubs == pubs.sorted)
  }

  test("structured output: fenced/malformed/missing-key LLM responses parse like the reference") {
    import graft.query.StructuredOutput
    // Fenced answer with preamble -> parsed; citation start_time floats -> Int.
    val fenced =
      """Thinking about it...
        |```json
        |{"query_response": "Use catalyst.", "sources": [
        |  {"video_id": "v1", "start_time": 20.0},
        |  {"video_id": "v3", "start_time": 3.0}]}
        |```""".stripMargin
    assert(StructuredOutput.toAgentAnswer(fenced).contains(
      AgentAnswer("Use catalyst.", Seq(("v1", 20), ("v3", 3)))))
    // Malformed JSON -> None (reference: parse exception -> None).
    assert(StructuredOutput.toAgentAnswer("{\"query_response\": oops").isEmpty)
    // Schema-invalid source ELEMENTS (null / missing citation fields)
    // are the Pydantic-ValidationError analog -> None, never a crash.
    assert(StructuredOutput.toAgentAnswer(
      "{\"query_response\": \"x\", \"sources\": [null]}").isEmpty)
    assert(StructuredOutput.toAgentAnswer(
      "{\"query_response\": \"x\", \"sources\": [{\"video_id\": \"v1\"}]}").isEmpty)
    // A sources value that isn't an array of objects at all collapses
    // to null under from_json PERMISSIVE — indistinguishable from a
    // missing key, so it parses as answer-without-citations (documented
    // divergence from Pydantic's hard error).
    assert(StructuredOutput.toAgentAnswer(
      "{\"query_response\": \"x\", \"sources\": [123]}").contains(AgentAnswer("x", Nil)))
    // Missing sources key -> empty citations (Pydantic default-on-absence).
    assert(StructuredOutput.toAgentAnswer("{\"query_response\": \"hi\"}").contains(
      AgentAnswer("hi", Nil)))
    // QueryParseResponse: arrays + year strings -> typed ParsedQuery.
    val pq = StructuredOutput.toParsedQuery(
      """{"shows": ["Alpha Show"], "hosts": [], "topics": ["spark"],
        | "exact_year": null, "year_range": "2020-2022"}""".stripMargin).get
    assert(pq.shows == Seq("Alpha Show"))
    assert(pq.topics == Seq("spark"))
    assert(pq.yearRange.contains((2020, 2022)))
    assert(pq.exactYear.isEmpty && pq.beforeYear.isEmpty && pq.afterYear.isEmpty)
  }

  test("structured output: driver-path direct eval agrees with the column path byte-for-byte") {
    import graft.query.StructuredOutput
    import spark.implicits._
    // The driver path needs no SparkSession (direct interpreted eval of
    // the shared expression); this pins it to the distributed column
    // path on every edge the parser distinguishes.
    val fixtures = Seq(
      "preamble\n```json\n{\"query_response\": \"A\", \"sources\": [{\"video_id\": \"v\", \"start_time\": 7.5}]}\n```",
      "{\"query_response\": \"B\", \"sources\": []}",
      "{\"query_response\": \"C\"}",
      "{\"query_response\": \"x\", \"sources\": [null]}",
      "{\"query_response\": \"x\", \"sources\": [{\"video_id\": \"v1\"}]}",
      "{\"query_response\": \"x\", \"sources\": [123]}",
      "{\"query_response\": oops",
      "no json at all",
      "",
      "{\"query_response\": \"unicode \\u00e9\\u4e2d\", \"sources\": []}")
    val colRows = fixtures.toDF("r")
      .select(StructuredOutput.parseAgentResponse(col("r")).as("p"))
      .select(col("p.query_response"), col("p.sources"))
      .collect()
    fixtures.zip(colRows).foreach { case (raw, row) =>
      val viaColumn = for {
        resp <- Option(row.getString(0))
        srcs = Option(row.getSeq[org.apache.spark.sql.Row](1)).getOrElse(Seq.empty)
        if srcs.forall(s => s != null && !s.isNullAt(0) && !s.isNullAt(1))
      } yield AgentAnswer(resp, srcs.map(s => (s.getString(0), s.getDouble(1).toInt)))
      assert(StructuredOutput.toAgentAnswer(raw) == viaColumn, s"fixture: $raw")
    }
    val pqFixtures = Seq(
      """{"shows": ["S"], "hosts": ["h1", "h2"], "topics": [], "exact_year": "2021"}""",
      """{"shows": null, "year_range": "2019-2023", "before_year": "x"}""",
      "{}", "garbage")
    val pqRows = pqFixtures.toDF("r")
      .select(StructuredOutput.parseQueryResponse(col("r")).as("p"))
      .select(col("p.shows"), col("p.hosts"), col("p.topics"), col("p.exact_year"),
        col("p.year_range"), col("p.before_year"), col("p.after_year"))
      .collect()
    pqFixtures.zip(pqRows).foreach { case (raw, row) =>
      val d = StructuredOutput.toParsedQuery(raw)
      if ((0 until 7).forall(row.isNullAt)) assert(d.isEmpty, raw)
      else {
        val pq = d.get
        assert(pq.shows == Option(row.getSeq[String](0)).getOrElse(Seq.empty), raw)
        assert(pq.hosts == Option(row.getSeq[String](1)).getOrElse(Seq.empty), raw)
        assert(pq.exactYear ==
          Option(row.getString(3)).flatMap(_.trim.toIntOption), raw)
      }
    }
  }

  test("process: JSON answerer (from_json boundary) flows into citation rendering") {
    // A raw-text LLM stub: cites the first two context docs in a fenced
    // JSON AgentResponse, like a real structured-output model would.
    val rawLlm = (query: String, ctx: Seq[ContextDoc]) => {
      val cites = ctx.take(2).map(c =>
        s"""{"video_id": "${c.videoId}", "start_time": ${c.startTime}}""").mkString(", ")
      s"""Let me answer "$query".
         |```json
         |{"query_response": "Parsed structurally.", "sources": [$cites]}
         |```""".stripMargin
    }
    val engine = new QueryEngine(store(), parser,
      new graft.query.JsonAnswerer(rawLlm), embedder)
    val (answer, citations) = engine.process("""anything on "spark"?""")
    assert(answer.queryResponse == "Parsed structurally.")
    assert(answer.sources.size == 2)
    val rows = citations.collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[String]("video_href").startsWith("https://www.youtube.com/watch?v="))
  }

  test("formatContext: numbered transcript blocks with JSON metadata") {
    val engine = new QueryEngine(store(), parser, new EchoAnswerer(), embedder)
    val retrieved = engine.retrieve("""tell me about "spark" please""")
    val ctx = graft.query.Citations.formatContext(retrieved,
      Seq("published_at", "video_id", "start_time"), "text",
      Seq("video_id", "show_name", "title", "start_time"))
    val first = ctx.orderBy("published_at", "video_id", "start_time")
      .select("page_content").as[String].head()
    assert(first.startsWith("TRANSCRIPT #1 TEXT:\n```"))
    assert(first.contains("METADATA:\n```{\"video_id\":\"v1\""))
  }
}
