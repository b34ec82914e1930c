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

  /** TOKENIZER-AWARE decontamination: the [[ngramOverlap]] probe run
    * on n-grams of the PRODUCTION TOKENIZER'S integer ids instead of
    * words — the convention the published eval-leak checks actually
    * use (GPT-3 Appendix C and its successors define overlap on token
    * n-grams of the training tokenizer, not on whitespace words).
    * Token n-grams see contamination word n-grams structurally CAN'T:
    * a rare word shared between a train doc and an eval doc in
    * otherwise different contexts never forms a shared word n-gram
    * (n >= 2), but its subword ids form shared id n-grams; and id
    * n-grams cross word boundaries inside the id stream, so partial
    * phrase overlap straddling a word boundary also fires.
    *
    * `merges`/`vocab` are the trained byte-level tokenizer
    * ([[Bpe.trainByteLevel]] / [[Bpe.vocabTableByteLevel]] — the q178
    * path); both relations are vocabulary-sized. Scale shape is
    * [[ngramOverlap]]'s exactly: the eval side is benchmark-sized, its
    * distinct id-n-gram set broadcasts, and the corpus side is
    * dictionary-grain tokenize + map-only explode + hash probe — no
    * corpus shuffle. The n-gram key is the space-joined id string
    * (lossless for integer ids, and the replayable cross-engine
    * spelling). Output: (idCol, n_shared, contaminated).
    */
  def tokenIdNgramOverlap(
      train: DataFrame, eval: DataFrame, textCol: String, idCol: String,
      merges: Seq[Bpe.Merge], vocab: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def idGrams(ids: Column): Column =
      when(size(ids) >= n,
        transform(sequence(lit(0), size(ids) - n),
          i => array_join(
            transform(slice(ids, i + 1, lit(n)), t => t.cast("string")), " ")))
        .otherwise(array().cast("array<string>"))
    def grams(df: DataFrame): DataFrame =
      Bpe.tokenizeToIdsByteLevel(df, textCol, idCol, merges, vocab)
        .select(col(idCol), explode(idGrams(col("token_ids"))).as("__g"))
    val evalGrams = grams(eval).select(col("__g")).distinct()
    val hits = grams(train)
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
