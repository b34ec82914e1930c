package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed z-score outlier detection (§2.11 extension — the
  * per-group anomaly gate a metrics/quality pipeline runs at ingest:
  * "which rows sit more than z standard deviations from their group's
  * mean?").
  *
  * The float spelling — `abs(v - avg) > z * stddev_samp(v)` — is a
  * cross-engine minefield: stddev is a sqrt over a float sum whose
  * last ULP depends on reduction order, so rows NEAR the threshold
  * flip between engines (and between runs, since shuffle order isn't
  * stable). This operator instead clears denominators and evaluates
  * the SAME predicate in exact integer arithmetic on the cents grid:
  *
  *   |v - s/n| > z * sqrt((n*q - s^2) / (n*(n-1)))
  *   <=>  (n*v - s)^2 * (n-1) > z^2 * n * (n*q - s^2)
  *
  * with v in cents (exact int64), s = sum(v), q = sum(v^2). Both
  * sides are integers — decimal(38,0) here, HUGEINT in the DuckDB
  * oracle — so the flag is bit-identical on any engine and any row
  * order, at any scale.
  *
  * Scale shape: one aggregation at GROUP grain (tiny), broadcast back,
  * then a map-only flag pass and one more group-grain aggregation.
  * The row-grain data is never shuffled — the group-stat join is a
  * broadcast, not a window over a skewed partition key.
  *
  * Output: (group, n_events, n_outliers, outlier_sum) with
  * outlier_sum the exact cents total of flagged values.
  */
object Outliers {

  def zscoreOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      z: Int): DataFrame = {
    require(z > 0, s"z must be > 0, got $z")
    val dec = "decimal(38,0)"
    val v100 = rint(col(valueCol) * 100).cast("long")
    val nD = col("__n").cast(dec)
    val sD = col("__s").cast(dec)
    val qD = col("__q").cast(dec)
    // Everything group-constant — the z^2*n*(n*q - s^2) threshold and
    // the (n-1) factor — is computed ONCE per group here, not per row:
    // the row-grain hot loop below pays 3 decimal multiplications, not 6.
    val stats = df
      .select(col(groupCol), v100.as("__v"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__q"))
      .withColumn("__rhs", lit(z * z).cast(dec) * nD * (nD * qD - sD * sD))
      .withColumn("__nm1", nD - lit(1).cast(dec))
    val vD = col("__v").cast(dec)
    val dev = nD * vD - sD
    val lhs = dev * dev * col("__nm1")
    val flag = col("__n") >= 2 && lhs > col("__rhs")
    df.select(col(groupCol), v100.as("__v"))
      .join(broadcast(stats), Seq(groupCol))
      .withColumn("__out", when(flag, 1L).otherwise(0L))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__out")).as("n_outliers"),
        (sum(when(col("__out") === 1L, col("__v")).otherwise(0L))
          .cast("double") / lit(100.0)).as("outlier_sum"))
  }

  /** Robust (median/MAD) outlier detection — the heavy-tail-safe
    * complement of [[zscoreOutliers]]: mean/stddev are themselves
    * dragged by the outliers they're meant to find; median and median
    * absolute deviation have breakdown point 0.5 (Hampel's rule).
    *
    * Exactness trick: over the cents grid, every interpolated median
    * lands on the half-integer grid (position frac is 0 or 0.5), so
    * DOUBLED medians are exact int64 — `med2 = 2·median(v)`,
    * `dev2 = |2v − med2|`, `mad4 = 2·median(dev2)` — and the Hampel
    * predicate |v − med| > k·MAD becomes the all-integer
    * `2·dev2 > k·mad4`. No float ever crosses an engine boundary.
    *
    * Scale shape: two group-grain aggregations (the exact-median
    * buffers are value-grain — the cents grid bounds them; the GK
    * sketch row is the 100 TB substitute) broadcast back over map-only
    * flag passes; row-grain data is never shuffled.
    *
    * Output: (group, n_events, n_outliers, outlier_sum) — the
    * [[zscoreOutliers]] contract, so consumers can swap gates.
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val v100 = rint(col(valueCol) * 100).cast("long")
    val vals = df.select(col(groupCol), v100.as("__v"))
    val med = vals.groupBy(col(groupCol))
      .agg((expr("percentile(__v, 0.5)") * 2).cast("long").as("__med2"),
        count(lit(1)).as("__n"))
    val withDev = vals.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev2", abs(lit(2L) * col("__v") - col("__med2")))
    val mad = withDev.groupBy(col(groupCol))
      .agg((expr("percentile(__dev2, 0.5)") * 2).cast("long").as("__mad4"))
    val flag = col("__n") >= 2 &&
      lit(2L) * col("__dev2") > lit(k.toLong) * col("__mad4")
    withDev.join(broadcast(mad), Seq(groupCol))
      .withColumn("__out", when(flag, 1L).otherwise(0L))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__out")).as("n_outliers"),
        (sum(when(col("__out") === 1L, col("__v")).otherwise(0L))
          .cast("double") / lit(100.0)).as("outlier_sum"))
  }
}
