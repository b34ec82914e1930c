package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column-grain data profiling (§2.11 extension — the
  * data-quality audit a training-data pipeline runs before and after
  * every transform: row counts, null rates, cardinalities, value
  * ranges, and byte budgets per column, as one small table).
  *
  * Shape: each row is unpivoted into (col_name, value-as-string)
  * pairs with an inline `explode(array(struct...))` — the same Expand
  * shape Catalyst itself plans for multi-column DISTINCT aggregates —
  * then ONE aggregation at column grain. Everything except the
  * distinct count combines map-side (count/min/max/sum), so the
  * shuffle carries |cols| partial rows per task plus the distinct
  * machinery; there is no per-column job, no driver loop, and the
  * scan is read once.
  *
  * The profile is computed on the STRING rendering of every column —
  * that is what makes one schema-stable output table possible (a
  * profile row is the same shape for a BIGINT column as for a VARCHAR
  * one), and integer-to-string rendering is engine-portable so the
  * whole table is full-value oracle-checkable.
  *
  * 100 TB note: `countDistinct` is exact here because the oracle
  * demands exactness; at petabyte scale swap it for
  * `approx_count_distinct` (HLL, mergeable — see [[Sketches]]) and the
  * aggregation becomes a pure one-pass map-side-combinable job.
  */
object Profile {

  /** Profile `cols` of `df`: for each column emit
    * (col_name, n_rows, n_vals, n_distinct, min_val, max_val,
    * sum_chars) where n_vals counts non-nulls, min/max/distinct are
    * over the string rendering, and sum_chars is the total rendered
    * character count (null renders as 0 chars).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val kvs = array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)
    df.select(explode(kvs).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.v").as("v"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("v")).as("n_vals"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"),
        sum(coalesce(length(col("v")), lit(0)).cast("long")).as("sum_chars"))
  }
}
