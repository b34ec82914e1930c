package graft

import graft.etl.{Extract, Load}
import org.apache.spark.sql.functions._
import java.sql.DriverManager

/** S1/S10 against an embedded Derby database: real JDBC scan with
  * predicate pushdown and the batched JDBC store sink.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def setupCatalog(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE videos_video") catch { case _: Exception => () }
      st.execute(
        "CREATE TABLE videos_video (id INT, video_id VARCHAR(20), channel_id INT)")
      val ins = conn.prepareStatement("INSERT INTO videos_video VALUES (?, ?, ?)")
      (1 to 10).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"vid$i"); ins.setInt(3, i % 5)
        ins.executeUpdate()
      }
    } finally conn.close()
  }

  test("S1: JDBC catalog scan with predicate pushed to the source") {
    setupCatalog()
    val df = Extract.readJdbcTable(spark, url, "videos_video")
      .where(col("channel_id") < 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(CHANNEL_ID,3)"),
      s"expected channel_id predicate pushed into the JDBC scan:\n$plan")
    assert(df.count() == 6) // channel_id in {0,1,2}: ids 1,2,5,6,7,10
  }

  test("P4-P8: compiled FilterSpecs land in the JDBC scan's PushedFilters") {
    // The reference pre-filters the serving store in SQL (pgvector
    // WHERE clause); here the user-facing FilterSpec tree compiles to
    // Columns that Catalyst translates into source filters on the JDBC
    // scan — the database does the filtering, not Spark.
    setupCatalog()
    import graft.query.FilterSpec
    val spec = FilterSpec.And(Seq(
      FilterSpec.Gte("channel_id", 1),
      FilterSpec.Lt("channel_id", 4),
      FilterSpec.In("video_id", Seq("vid1", "vid2", "vid3", "vid7")),
      FilterSpec.IsNotNull("id")))
    val df = Extract.readJdbcTable(spark, url, "videos_video")
      .where(FilterSpec.compile(spec))
    // The PushedFilters metadata string truncates at 100 chars by
    // default — widen it so every pushed filter is visible to assert on.
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    val plan =
      try df.queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    for (pushed <- Seq(
        "GreaterThanOrEqual(CHANNEL_ID,1)", "LessThan(CHANNEL_ID,4)",
        "In(VIDEO_ID,", "IsNotNull(ID)"))
      assert(plan.contains(pushed),
        s"expected $pushed in the JDBC scan's PushedFilters:\n$plan")
    // vid1(ch1), vid2(ch2), vid3(ch3), vid7(ch2) -> all pass the range+in
    assert(df.count() == 4)
  }

  test("S10: batched JDBC sink round-trips through the database") {
    val chunks = Seq(("vidA", 0.0, "first"), ("vidA", 10.0, "second"))
      .toDF("video_id", "start_time", "text")
    Load.writeStoreJdbc(chunks, url, "chunk_store", batchSize = 1)
    val back = Extract.readJdbcTable(spark, url, "chunk_store")
    assert(back.count() == 2)
    assert(back.select("video_id").distinct().as[String].collect().toSeq == Seq("vidA"))
  }
}
