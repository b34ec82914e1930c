package graft.query

import graft.functions.TimeFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's user-visible citation path (SURVEY.md §3.3;
  * loaders/agents/query_agent.py:117-191): filter retrieved docs to the
  * LLM-cited ones, group per video collecting the cited timestamps,
  * sort for display, and render timestamp/URL strings.
  */
object Citations {

  /** J7 — bug-for-bug with the reference (query_agent.py:117-133): the
    * cited-id and cited-timestamp memberships are INDEPENDENT `IN`s, not
    * pairwise (a doc passes when its video is cited by anyone AND its
    * int-truncated start matches any cited time, even of another video).
    * Two semi-joins on projected columns preserve exactly that.
    */
  def citedDocuments(
      retrieved: DataFrame,
      cited: DataFrame,
      idCol: String,
      timeCol: String): DataFrame = {
    val ids = cited.select(col(idCol)).distinct()
    val times = cited.select(col(timeCol).cast("int").as(timeCol)).distinct()
    retrieved
      .withColumn(timeCol, col(timeCol).cast("int"))
      .join(ids, Seq(idCol), "left_semi")
      .join(times, Seq(timeCol), "left_semi")
  }

  /** A4 + O3 — group cited docs per video accumulating the sorted set of
    * int timestamps (query_agent.py:121-158). `array_sort(collect_set)`
    * is the deterministic declared form of the reference's `set[int]` +
    * per-video asc sort.
    */
  def groupCitations(docs: DataFrame, idCol: String, timeCol: String): DataFrame =
    docs.groupBy(col(idCol))
      .agg(array_sort(collect_set(col(timeCol).cast("int"))).as("timestamps"),
        count(lit(1)).as("n_cites"))

  /** F7 — watch URL with the reference's +10s start buffer
    * (query_agent.py:170-190; buffer loaders/utils/config.py:17).
    */
  def watchUrl(videoId: Column, startSec: Column): Column =
    concat(lit("https://www.youtube.com/watch?v="), videoId,
      lit("&t="), (startSec.cast("long") + 10), lit("s"))

  /** F5 — display timestamp `H:MM:SS` / `M:SS` (query_agent.py:161-168). */
  def displayTimestamp(startSec: Column): Column = TimeFunctions.hms(startSec)
}
