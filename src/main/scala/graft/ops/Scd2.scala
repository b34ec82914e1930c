package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 temporal versioning: turn an append-only change log into a
  * slowly-changing-dimension relation — one row per (key, state
  * episode) with `[valid_from, valid_to)` bounds and a current flag.
  * This is the dimension-side contract the as-of join
  * ([[AsOfJoin]], q58) consumes: facts join the version whose interval
  * covers their timestamp, and [[RangeJoin]] / q97's binned form does
  * it at scale when the dimension is too big to broadcast.
  *
  * No-op suppression is what makes it versioning rather than a rename:
  * a change row whose tracked state equals the key's previous state
  * opens no new version (re-emitted heartbeats and idempotent replays
  * collapse), so episode count tracks DISTINCT STATE RUNS, not log
  * volume.
  *
  * Scale shape: two windows, both partitioned by the key — one lag to
  * suppress no-ops, one lead over survivors to close intervals. Each
  * is one shuffle on the key with per-key sorted streams; no global
  * sort, no single-partition window anywhere. Ordering is total via
  * the (ts, tieCol) pair, so results are deterministic under replays
  * and engine changes.
  *
  * Reference behavior: kfai's store keeps only the latest row per key
  * (keep-best dedup, O2); the versioned form is part of the §2.11
  * training-pipeline extension surface (point-in-time-correct joins
  * need the history the latest-only store throws away).
  */
object Scd2 {

  /** @param changes change log: one row per observed (key, ts, state)
    * @param keyCol  business key
    * @param tsCol   change timestamp (version open time)
    * @param tieCol  total-order tie-break within equal timestamps
    * @param stateCol the tracked state column
    * @return (key, state, valid_from, valid_to, is_current); valid_to
    *         null on each key's current version (end-exclusive bounds,
    *         adjacent versions tile the timeline with no gaps)
    */
  def fromChangeLog(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      stateCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("__prev", lag(col(stateCol), 1).over(byKey))
      // Null-safe: a null state following a non-null one (or vice
      // versa) IS a state change; only a true repeat is suppressed.
      .where(!(col(stateCol) <=> col("__prev")))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select(col(keyCol), col(stateCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
