package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus statistics via MERGEABLE partial aggregates —
  * the maintenance pattern for corpus-level dashboards at 100 TB:
  * aggregate each arriving shard ONCE into a tiny per-group stats row
  * (counts, exact decimal sums, and a DataSketches HLL sketch for the
  * distinct dimension), persist those, and answer "stats over the
  * whole corpus" by merging stats rows — never rescanning raw data.
  * Every form here is associative and commutative, so shards can be
  * merged in any order, any grouping, and incrementally (yesterday's
  * merged row is just another partial).
  *
  * The distinct count is the interesting one: exact distinct does not
  * decompose (|A ∪ B| ≠ |A| + |B|), but HLL register state does —
  * union-of-sketches IS the sketch-of-union, so the merged estimate
  * equals what a full rescan would build, bit for bit. q101 pins
  * exactly that equality as an oracle boolean.
  *
  * Reference behavior: kfai recomputes its integrity counts with full
  * table scans each run (check_data_integrity.py); the mergeable form
  * is the §2.11 extension that keeps the same answers incremental.
  */
object IncrementalStats {

  /** Per-group partial stats for ONE shard: row count, exact decimal
    * weight sum, and the HLL register sketch of `distinctCol`. Output
    * is group-grain and tiny — this is the relation a pipeline
    * persists per ingest batch.
    */
  def shardStats(
      shard: DataFrame,
      groupCol: String,
      weightCol: String,
      distinctCol: String): DataFrame =
    shard.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(weightCol).cast("decimal(38,0)")).as("w_sum"),
        hll_sketch_agg(col(distinctCol)).as("distinct_sketch"))

  /** Merge any number of shard-stats rows (same schema, any order,
    * overlapping groups welcome) back to group grain. Counts and sums
    * add; sketches union losslessly. No raw-data scan anywhere.
    */
  def mergeStats(parts: DataFrame, groupCol: String): DataFrame =
    parts.groupBy(col(groupCol))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("w_sum")).as("w_sum"),
        hll_union_agg(col("distinct_sketch")).as("distinct_sketch"))

  /** Readable estimate column for a stats relation. */
  def withEstimate(stats: DataFrame): DataFrame =
    stats.withColumn("n_distinct_est",
      hll_sketch_estimate(col("distinct_sketch")))
}
