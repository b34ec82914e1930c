package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint report (§2.11 extension — the
  * Deequ-style ingest gate: every load runs a battery of constraints
  * (completeness, uniqueness, referential integrity, ranges) and the
  * pipeline proceeds only on an all-green report; one row per check,
  * violation COUNT as the metric so a red row says how red).
  *
  * Exactness: every metric is an integer count (aggregations,
  * anti-joins) — nothing to round anywhere.
  *
  * Scale shape: each primitive is a shape the engine already proves at
  * scale — map-side-combinable conditional counts, key-grain
  * duplicate aggregation, broadcast/shuffle anti-joins for orphans —
  * and the report is a UNION of 1-row aggregates, so checks run as
  * independent stages of one job (or incrementally per partition in a
  * real deployment).
  */
object DataQuality {

  private def one(name: String, metric: DataFrame): DataFrame =
    metric.select(lit(name).as("check"), col("metric").cast("long").as("metric"))

  /** Rows where `colName` is null. */
  def nullCount(df: DataFrame, colName: String, name: String): DataFrame =
    one(name,
      df.agg(sum(when(col(colName).isNull, 1L).otherwise(0L)).as("metric")))

  /** Rows beyond the first per key tuple (0 = key is unique). */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String], name: String): DataFrame =
    one(name,
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(sum(col("__n") - 1L).as("metric")))

  /** Child rows whose key has no parent — referential-integrity
    * violations via anti-join (never a driver-side key set).
    */
  def orphanCount(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    one(name,
      child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)).distinct(),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("metric")))

  /** Rows with `colName` outside [lo, hi] (nulls count as violations —
    * a range constraint implies presence).
    */
  def rangeViolations(
      df: DataFrame, colName: String, lo: Double, hi: Double,
      name: String): DataFrame =
    one(name,
      df.agg(sum(when(col(colName).isNull ||
          col(colName) < lo || col(colName) > hi, 1L).otherwise(0L))
        .as("metric")))

  /** (check, metric, passed) — the union of the given 1-row checks;
    * a check passes iff its violation count is zero.
    */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .select(col("check"), coalesce(col("metric"), lit(0L)).as("metric"))
      .withColumn("passed", col("metric") === 0L)
}
