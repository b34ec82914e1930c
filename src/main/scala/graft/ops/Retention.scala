package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis (§2.11 extension — the activation/decay
  * curve behind every usage dashboard: bucket users by their FIRST
  * activity period, then count how many of each cohort are still
  * active k periods later).
  *
  * Shape: one user-grain aggregation (first event), one equi-join of
  * the event stream against that user→cohort map on the user key, and
  * one (cohort, offset)-grain distinct-count — every stage shuffles on
  * a real key, nothing global. At 100 TB the user→cohort map is the
  * small side (one row per user, two columns); Spark broadcasts it
  * when it fits and falls back to a co-partitioned shuffle join when
  * it doesn't — both correct, and AQE picks at runtime.
  *
  * Periods are ISO weeks via `date_trunc('week', ts)` (Monday start —
  * DuckDB's `date_trunc('week')` agrees), and the offset is exact
  * integer day arithmetic / 7.
  */
object Retention {

  private def week(c: Column): Column = date_trunc("week", c).cast("date")

  /** (cohort_week, week_offset, n_users): distinct `userCol` active in
    * cohort_week + offset, for every cohort. offset 0 rows equal each
    * cohort's size by construction.
    */
  def weeklyCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firsts = events
      .groupBy(col(userCol).as("__u"))
      .agg(min(week(col(tsCol))).as("cohort_week"))
    events
      .select(col(userCol).as("__u"), week(col(tsCol)).as("__w"))
      .join(firsts, "__u")
      .withColumn("week_offset",
        (datediff(col("__w"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }
}
