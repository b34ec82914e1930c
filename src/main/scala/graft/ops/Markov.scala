package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence transition statistics (§2.11 extension — the
  * "what does a user do next" matrix behind behavioral session
  * analysis, anomaly scoring, and synthetic-trajectory generation:
  * first-order Markov estimates over per-user event streams).
  *
  * Exactness: transition counts are integers over a deterministic
  * per-user total order ((ts, tieCol) — tieCol is a unique event id, so
  * equal-timestamp events order identically on every engine), and the
  * row-conditional probabilities ship as micro-units via
  * IntegralDivide. Every digit reproduces in any engine.
  *
  * Scale shape: ONE shuffle — the per-user sequence window partitions
  * by user (the natural key the stream is already bucketed by in a
  * real deployment, making the window exchange-free there); the
  * (src,dst) aggregation is map-side combinable down to |types|² rows,
  * and the src-grain totals it joins against are |types| rows —
  * broadcast, never a second fact-grain shuffle. No state beyond the
  * per-user sort holds anywhere, so 1000 executors split users, not
  * the matrix.
  */
object Markov {

  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** (src, dst, n, n_src, p_micro) for every observed consecutive
    * event-type pair: `n` transitions src→dst, `n_src` transitions
    * leaving src, `p_micro` = 1e6·n/n_src floor-divided. The final
    * event of each user has no successor and (correctly) feeds no
    * transition.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val trans = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .where(col("dst").isNotNull)
    val counts = trans.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    // Row totals as a window over the |types|²-row matrix itself — a
    // groupBy+join spelling re-executed the whole events scan + window
    // subtree for the broadcast side (counts is referenced twice and
    // aggregates are not common subexpressions across branches).
    val bySrc = Window.partitionBy(col("src"))
    counts
      .withColumn("n_src", sum(col("n")).over(bySrc))
      .select(col("src"), col("dst"), col("n"), col("n_src"),
        intDiv(col("n") * lit(1000000L), col("n_src")).as("p_micro"))
  }
}
