package graft.tools
import org.apache.spark.sql.functions._
/** Pair-volume anatomy for the support-pair discovery (the numbers in
  * [[graft.ops.Affinity.supportPairs]]'s Scaladoc): total pair rows
  * reaching the aggregation, distinct pairs, support-2 survivors.
  * Usage: PairStats <sfDir>
  */
object PairStats {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.core.Tables.lineitem(spark, args(0))
    val items = li.select(col("l_orderkey").as("b"), col("l_partkey").as("i")).distinct()
    val l = items.select(col("b"), col("i").as("pa"))
    val r = items.select(col("b"), col("i").as("pb"))
    val agg = l.join(r, Seq("b")).where(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("distinct_pairs"), sum(col("n")).as("pair_rows"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("support2_pairs")).collect()(0)
    println(s"[pairstats] pair_rows=${agg.getLong(1)} distinct=${agg.getLong(0)} support2=${agg.getLong(2)}")
    spark.stop()
  }
}
