package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the greatest right
  * timestamp <= the left timestamp within the same key — the operator a
  * feature-store / training-data pipeline needs that Spark has no
  * builtin for.
  *
  * Implementation is the scalable union+window composition, NOT a range
  * cross join: tag both sides, union, and take per key the running
  * `last` right-side timestamp over (ts, side) order. One shuffle on
  * the key, state bounded by the window frame — survives arbitrarily
  * dense right sides where a `left.ts >= right.ts` theta join would
  * explode quadratically.
  *
  * Tie semantics: right rows sort before left rows at equal ts, so a
  * right event at exactly left.ts matches (inclusive <=), matching
  * DuckDB `ASOF LEFT JOIN ... ON r.ts <= l.ts`.
  */
object AsOfJoin {

  /** Left rows + `matched_ts` = max right `tsCol` <= left `tsCol` per
    * `keyCol` (null when no right row precedes).
    */
  def asofMatchedTs(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val l = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__side", lit(1))
    val r = right.select(col(keyCol), col(tsCol).as("__ts"))
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("matched_ts",
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__ts", "__side")
  }
}
