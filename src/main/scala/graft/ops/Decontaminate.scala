package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (§2.11 extensions): flag training
  * documents that share at least one word n-gram with an evaluation
  * set — the standard guard against test-set leakage into training
  * data (GPT-3 App. C / PaLM-style n-gram overlap checks).
  *
  * Scale shape: the EVAL side is benchmark-sized (thousands of docs),
  * so its distinct n-gram set is built once and BROADCAST; the 100 TB
  * training side is only ever exploded map-side and hash-probed — no
  * shuffle of the corpus, no self-join. The n-gram explode is the
  * irreducible probe grain, and [[graft.functions.NgramsExpr]] keeps
  * the n-gram build codegen'd.
  */
object Decontaminate {

  /** Per-training-doc count of DISTINCT eval-shared n-grams (docs with
    * zero overlap included, `n_shared` 0) plus a `contaminated` flag.
    * Output: (idCol, n_shared, contaminated).
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val evalGrams = eval
      .select(explode(TextAnalysis.ngrams(col(textCol), n)).as("__g"))
      .distinct()
    val hits = train
      .select(col(idCol), explode(TextAnalysis.ngrams(col(textCol), n)).as("__g"))
      .join(broadcast(evalGrams), "__g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__g")).as("n_shared"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }
}
