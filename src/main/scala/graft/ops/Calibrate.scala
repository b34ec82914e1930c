package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Score calibration to corpus percentiles (§2.11 extension — raw
  * classifier/quality scores are meaningless across corpora; the
  * curation decision is always "is this document in the top X% of THIS
  * corpus", i.e. the empirical CDF. This maps each score to its
  * percentile bucket against exact interpolated quantile boundaries.)
  *
  * Exactness: boundaries are Spark's exact interpolated percentiles
  * (the quantile_cont identity q57 pins); bucket assignment counts
  * strict `boundary < score` over the boundary array — both engines
  * compare the same doubles, so the bucket edge is bit-stable.
  *
  * Scale shape: ONE group-less aggregation derives the boundary array
  * (constant-size result; the percentile buffer is value-grain, and
  * at true 100 TB scale the [[Sketches.quantileSketchBound]] GK
  * summaries replace it — same downstream shape), broadcast as a
  * 1-row literal-like relation to a map-only bucket projection. The
  * per-row work is a bounded HOF over `buckets-1` elements (19 at the
  * default — bounded, unlike the per-token lambdas this codebase
  * replaces with native expressions), so the scan stays exchange-free.
  */
object Calibrate {

  /** (id, score, bucket) per row: bucket b ∈ [1, buckets] means the
    * score lies above the (b−1)/buckets exact quantile boundary (and
    * at-or-below the next) — bucket = 1 + #{boundaries strictly below
    * the score}.
    */
  def scorePercentile(
      scored: DataFrame,
      scoreCol: String,
      idCol: String,
      buckets: Int = 20): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    // Both the boundary aggregation and the bucket projection consume
    // the scored relation — persist the two-column slice once so the
    // upstream scan + scoring subtree runs a single time (the repo's
    // one-reference/persist discipline; the slice keeps the cache
    // skinny regardless of how wide the caller's scoring plan is).
    val slim = graft.core.Caches.persistTracked(
      scored.select(col(idCol).as("id"), col(scoreCol).as("score")))
    val bounds = slim.agg(
      expr(s"percentile(score, array(${ps.mkString(",")}))").as("bnds"))
    slim
      .crossJoin(broadcast(bounds))
      .select(col("id"), col("score"),
        (size(filter(col("bnds"), b => b < col("score"))) + 1)
          .cast("long").as("bucket"))
  }
}
