package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without an equi key — the join shape
  * Spark's planner can only express as a BroadcastNestedLoopJoin
  * (every point compared against every interval: |P|·|I| predicate
  * evaluations, quadratic at corpus scale and driver-OOM once the
  * interval side outgrows the broadcast threshold).
  *
  * The scale path is BINNING, the standard interval-join technique in
  * distributed engines: quantize time into fixed-width bins, explode
  * each interval to the bins it covers, tag each point with the single
  * bin containing it, equi-join on the bin, and re-check the exact
  * range predicate. Work drops from |P|·|I| to |pairs sharing a bin| —
  * proportional to the true match volume when `binSeconds` is sized
  * near the typical interval length — and the join is an ordinary
  * shuffled (or AQE-broadcast) hash join: partitioned by bin,
  * map-side prunable, no nested loop anywhere.
  *
  * Exactly-once by construction: a point lies in exactly ONE bin, so
  * each qualifying (point, interval) pair meets in exactly one bin and
  * the output needs no dedup pass.
  *
  * Reference behavior: kfai filters fact rows against one window at a
  * time (WHERE ts BETWEEN ? AND ?; e.g. transcript chunks against a
  * video's span) — the relational many-intervals form is part of the
  * §2.11 training-pipeline extension surface (attributing events /
  * documents to overlapping collection windows).
  */
object RangeJoin {

  /** Inner-join `points` to every interval of `intervals` with
    * `start <= ts < end` (end-EXCLUSIVE, the event-window convention —
    * touching windows do not double-count their boundary point).
    *
    * Output carries all columns of both inputs (caller keeps names
    * disjoint, as with a plain `join`). Null timestamps/bounds drop
    * out (inner-join semantics). Intervals with `end < start` match
    * nothing.
    *
    * @param binSeconds bin width; size it near the TYPICAL interval
    *                   length. Each interval explodes to
    *                   `len/binSeconds + 1` bins (its shuffled
    *                   footprint), while a too-wide bin pays more
    *                   false candidate pairs in the exact re-check —
    *                   the classic space/selectivity trade.
    */
  def pointInIntervalJoin(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val w = binSeconds * 1000000L // micros per bin
    val p = points.withColumn("__graft_bin", floor(unix_micros(col(tsCol)) / w))
    // Inclusive bin span; the end bin is kept even when `end` sits on
    // its first microsecond — the exact re-check drops the non-match,
    // and guarding it here would save at most one bin row per
    // interval. sequence() needs the degenerate end<start guard (it
    // would otherwise step BACKWARD and emit phantom bins).
    val i = intervals
      .where(col(startCol) <= col(endCol))
      .withColumn("__graft_bin", explode(sequence(
        floor(unix_micros(col(startCol)) / w),
        floor(unix_micros(col(endCol)) / w))))
    p.join(i, Seq("__graft_bin"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__graft_bin")
  }
}
