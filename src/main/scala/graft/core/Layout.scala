package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical layout helpers for the 100 TB posture: bucketed tables give
  * co-located, shuffle-free joins and aggregations on the bucket key —
  * the chunk store bucketed by `video_id` joins its skip-state /
  * citation sides without either side shuffling.
  *
  * Bucketing goes through the session catalog (`saveAsTable`): bucket
  * metadata lives in the catalog, and Catalyst elides the Exchange when
  * both sides are bucketed by the join key into the same bucket count.
  */
object Layout {

  /** Write `df` as a bucketed+sorted catalog table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Shuffle-free equi-join of two tables bucketed on the join key.
    * (A plain `.join` — the point is the PLAN: with matching bucket
    * specs Catalyst plans a sort-merge join with zero Exchange.)
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
