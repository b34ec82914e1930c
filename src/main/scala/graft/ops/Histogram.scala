package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth (equal-frequency) histograms (§2.11 extension — the
  * distribution profile behind skew diagnosis, salting decisions, and
  * range-partition boundary planning: "where do I cut this column so
  * every slice carries the same row count?").
  *
  * The naive spelling — `ntile(b) OVER (ORDER BY v)` — is a GLOBAL
  * window: one reducer sorts the entire column. This operator instead
  * computes the b-1 interior quantile boundaries with the exact
  * interpolated `percentile` aggregate (sort happens per-aggregation-
  * buffer at value grain, not row grain), broadcasts the tiny boundary
  * array, and assigns buckets scan-side with a codegen'd
  * `size(filter(bounds, b < v))` — a map-only pass plus one b-row
  * aggregation. No row-grain global sort anywhere.
  *
  * Cross-engine determinism: boundaries are rounded to 4 decimals
  * (the q57 percentile precedent — Spark `percentile` and DuckDB
  * `quantile_cont` agree on the interpolated value; rounding pins the
  * rendered grid), and bucket membership counts boundaries STRICTLY
  * below v, so a value equal to a rounded boundary lands in the lower
  * bucket on both engines.
  *
  * Output: (bucket, n, min_val, max_val, sum_val) — bucket in
  * [0, buckets-1], sum exact via the integer-cents grid.
  */
object Histogram {

  /** Decimal-exact sum of a 2-dp value column (cents grid). */
  private def centsSum(v: Column): Column =
    (sum(rint(v * 100).cast("long")).cast("double") / lit(100.0))

  def equiDepth(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val v = col(valueCol)
    val bounds = df
      .agg(expr(
        s"percentile($valueCol, array(${probs.mkString(",")}))")
        .as("__bounds"))
      .select(transform(col("__bounds"), b => round(b, 4)).as("__bounds"))
    df.where(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("bucket", size(filter(col("__bounds"), b => b < v)).cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(v).as("min_val"),
        max(v).as("max_val"),
        centsSum(v).as("sum_val"))
  }
}
