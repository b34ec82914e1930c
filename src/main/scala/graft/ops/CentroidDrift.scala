package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space drift monitor (§2.11 extension — the vector-side
  * complement of [[Drift.klDrift]]: when a corpus is re-crawled,
  * re-embedded, or appended, did each label's REGION of embedding
  * space move? Compares per-label centroids between two slices via
  * per-dimension mean shift).
  *
  * Exactness: dims snap onto the 1e-6 grid as longs at the scan, all
  * sums are exact integer math (map-side combinable), per-dim means
  * floor-divide, and the drift metrics are integer L1 / squared-L2
  * over the 64 mean deltas — every digit engine-portable at ANY
  * corpus size. (A cosine between centroids would need float
  * accumulation whose rounding order engines don't share; the mean
  * grid carries the same signal exactly, and a deployment wanting
  * cosine derives it from these same sums.)
  *
  * Scale shape: one (label, dim)-grain aggregation — the shuffle
  * carries ≤ |labels|·dims partial rows PER PARTITION after map-side
  * combine, never the vectors; the final label-grain reduce is over
  * |labels|·dims rows. Constant-size state end to end.
  */
object CentroidDrift {

  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** (label, n_old, n_new, l1_drift_micro, l2sq_drift) per label with
    * members on BOTH sides of the `isOld` split: per-dimension
    * grid-snapped means, L1 = Σ|Δmean|, L2² = ΣΔmean² (micro and
    * micro² units).
    */
  def centroidDrift(
      emb: DataFrame,
      vecCol: String,
      labelCol: String,
      isOld: Column): DataFrame = {
    val d = emb
      .select(col(labelCol).as("label"), isOld.as("is_old"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("label"), col("is_old"), col("dim"),
        rint(col("v") * lit(1000000.0)).cast("long").as("vm"))
    val s = d.groupBy(col("label"), col("dim")).agg(
      sum(when(col("is_old"), col("vm")).otherwise(0L)).as("s_old"),
      sum(when(!col("is_old"), col("vm")).otherwise(0L)).as("s_new"),
      sum(when(col("is_old"), 1L).otherwise(0L)).as("n_old"),
      sum(when(!col("is_old"), 1L).otherwise(0L)).as("n_new"))
    val m = s.where(col("n_old") > 0 && col("n_new") > 0)
      .select(col("label"), col("n_old"), col("n_new"),
        (intDiv(col("s_new"), col("n_new")) -
          intDiv(col("s_old"), col("n_old"))).as("delta"))
    m.groupBy(col("label"), col("n_old"), col("n_new"))
      .agg(sum(abs(col("delta"))).as("l1_drift_micro"),
        sum(col("delta") * col("delta")).as("l2sq_drift"))
      .select(col("label"), col("n_old"), col("n_new"),
        col("l1_drift_micro"), col("l2sq_drift"))
  }
}
