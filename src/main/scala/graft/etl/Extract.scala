package graft.etl

import graft.functions.TimeFunctions
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Extract stage (SURVEY.md §3.1; reference fetch_raw_data.py):
  * S3 recursive JSON document read, J4 work discovery, J3 enrichment
  * merge, S8 partitioned sink.
  *
  * Scale posture: the JSON read is a schema'd distributed scan (one task
  * per file split, no driver listing loop); work discovery is an
  * anti-join (the reference's in-memory python sets become a distributed
  * set difference); the sink partitions by year/month so downstream
  * reads prune partitions.
  */
object Extract {

  val videoSchema = Encoders.product[VideoDoc].schema

  /** S3: recursive JSON doc scan — one `VideoDoc` per file, any depth
    * (reference `RAW_JSON_DIR.rglob("*.json")`, fetch_raw_data.py:60-62).
    * multiLine because each file is one pretty-printed JSON object.
    */
  def readRawDocs(spark: SparkSession, dir: String): Dataset[VideoDoc] = {
    import spark.implicits._
    spark.read
      .schema(videoSchema)
      .option("multiLine", true)
      .option("recursiveFileLookup", true)
      .json(dir)
      .as[VideoDoc]
  }

  /** J4: work discovery — catalog ids minus (processed ∪ skipped)
    * (fetch_raw_data.py:64-67). Anti-join, not driver-side sets.
    */
  def discoverWork(
      catalog: DataFrame,
      processedIds: DataFrame,
      skippedIds: DataFrame,
      idCol: String = "video_id"): DataFrame = {
    val done = processedIds.select(col(idCol)).union(skippedIds.select(col(idCol)))
    catalog.join(done, Seq(idCol), "left_anti")
  }

  /** J3: enrichment merge — inner join with the (stub) API metadata,
    * right side wins on column conflicts (the reference's
    * `dict(video) | youtube_api_data[video_id]`, fetch_raw_data.py:82-93;
    * ids missing on either side drop out of the inner join, and the
    * unmatched-row capture is the caller's `left` + null-check variant).
    */
  def enrich(work: DataFrame, apiData: DataFrame, idCol: String = "video_id"): DataFrame = {
    // Right-wins on conflicts = drop the left's conflicting columns, then
    // a plain using-column inner join.
    val conflicts = work.columns.toSet.intersect(apiData.columns.toSet) - idCol
    val left = conflicts.foldLeft(work)((df, c) => df.drop(c))
    left.join(apiData, Seq(idCol), "inner")
  }

  /** S8: partitioned document sink — year/month derived from
    * published_at, epoch 0 -> "unknown" (processing.py:20-32). JSON to
    * mirror the reference layout; parquet is the engine-native option.
    */
  def writePartitioned(
      docs: DataFrame,
      root: String,
      format: String = "json",
      epochCol: String = "published_at"): Unit =
    docs
      .withColumn("year", TimeFunctions.partitionYear(col(epochCol)))
      .withColumn("month", TimeFunctions.partitionMonth(col(epochCol)))
      .write
      .partitionBy("year", "month")
      .mode("overwrite")
      .format(format)
      .save(root)
}
