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
    // Apriori prune effect at minSupport=2: items in <2 baskets cannot
    // form a qualifying pair — how much of the pair shuffle do their
    // rows carry?
    val freq = items.groupBy(col("i")).agg(count(lit(1)).as("n"))
    val itemStats = freq.agg(count(lit(1)).as("items"),
      sum(when(col("n") >= 2, 1L).otherwise(0L)).as("frequent_items")).collect()(0)
    val pruned = items.join(freq.where(col("n") >= 2).select(col("i")), Seq("i"), "left_semi")
    val prunedRows = pruned.count()
    val pl = pruned.select(col("b"), col("i").as("pa"))
    val pr = pruned.select(col("b"), col("i").as("pb"))
    val prunedPairs = pl.join(pr, Seq("b")).where(col("pa") < col("pb")).count()
    println(s"[pairstats] items=${itemStats.getLong(0)} frequent_items=${itemStats.getLong(1)} " +
      s"item_rows=${items.count()} pruned_item_rows=$prunedRows pruned_pair_rows=$prunedPairs")
    spark.stop()
  }
}
