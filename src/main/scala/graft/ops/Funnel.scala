package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral sequence funnel: per key, match an ordered chain of
  * event steps where each step must occur strictly after the previous
  * matched step and within `maxGapSeconds` of it, binding each step to
  * its EARLIEST qualifying occurrence — the standard greedy funnel
  * convention (well-defined, engine-portable, no backtracking; note it
  * is a CONVENTION, not prefix-maximizing: a later step-2 occurrence
  * could open a window that catches a step 3 the earliest one misses,
  * and a backtracking matcher is a different, costlier operator).
  * The product-analytics "view → click → purchase within an hour"
  * question.
  *
  * Scale shape: one filtered scan + per-key min-aggregation PER STEP —
  * k steps cost k map-side-combinable aggregations over the (filtered)
  * event stream joined key-grain, never an event-grain self-join and
  * never a per-key sort. Step relations are key-grain (one row per key
  * that reached the step), so the inter-step joins shrink
  * monotonically down the funnel.
  *
  * Reference behavior: kfai has no sequence analytics; §2.11 extension
  * alongside the session operators (q55/q73 group by time gap — this
  * matches by ORDER and gap).
  */
object Funnel {

  /** @param events     event stream
    * @param keyCol     funnel grouping key (user)
    * @param tsCol      event timestamp
    * @param typeCol    event type column matched against `steps`
    * @param steps      ordered step types (distinct values)
    * @param maxGapSeconds max seconds between consecutive matched steps
    * @return one row per key that completed step 1:
    *         (key, steps_completed, ts_1, ..., ts_k) — ts_i null once
    *         the funnel broke before step i
    */
  def funnelMatch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapSeconds: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive")
    // Step 1: earliest occurrence per key, unconditioned.
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol).as("key"))
      .agg(min(col(tsCol)).as("ts_1"))
    // Step i: earliest occurrence strictly after ts_{i-1} and within
    // the gap. Left join keeps broken funnels with their prefix.
    for ((step, i) <- steps.zipWithIndex.drop(1)) {
      val prev = col(s"ts_${i}")
      val stepMin = events.where(col(typeCol) === step)
        .select(col(keyCol).as("__k"), col(tsCol).as("__ts"))
        .join(acc, col("__k") === col("key") &&
          col("__ts") > prev &&
          col("__ts") <= prev + expr(s"INTERVAL $maxGapSeconds SECONDS"))
        .groupBy(col("__k"))
        .agg(min(col("__ts")).as(s"ts_${i + 1}"))
      acc = acc.join(stepMin, acc("key") === stepMin("__k"), "left")
        .drop("__k")
    }
    val tsCols = steps.indices.map(i => col(s"ts_${i + 1}"))
    acc.select(col("key") +: (
      tsCols.map(c => when(c.isNotNull, 1).otherwise(0))
        .reduce(_ + _).as("steps_completed") +: tsCols): _*)
  }
}
