package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring (§2.11 extensions):
  * train an add-alpha smoothed word-bigram model on a corpus and score
  * documents by mean negative log-probability — the perplexity-style
  * quality filter of CCNet (Wenzek et al. 2020, which trains a 5-gram
  * KenLM and buckets documents by perplexity; the cluster form keeps
  * the same statistic with a bigram model whose training IS a pair of
  * hash aggregations, so model fit and scoring both stay distributed).
  *
  * Model: P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha * V),
  * with V the corpus vocabulary size, c(w1 w2) the bigram occurrence
  * count and c(w1 ·) the occurrences of w1 as a bigram head. Unseen
  * bigrams take the same formula with c = 0, so scoring text OUTSIDE
  * the training corpus is well-defined (an unseen head gives the
  * uniform 1/V).
  *
  * Scale shape: training is two map-side-combinable aggregations at
  * bigram/head grain plus a one-row vocabulary count (broadcast onto
  * the model as a constant column). Scoring pre-aggregates each
  * document to (id, bigram, count) — bounding the join input at
  * distinct-bigram grain — then LEFT equi-joins the model relation
  * (for the unseen path) and reduces per document. The model is
  * shuffled, never collected: at 100 TB the bigram-type relation is
  * itself table-sized, which is exactly why the "model" stays a
  * DataFrame instead of a driver-side map. Head skew (stopword heads
  * dominating the model join) is the standard AQE skew-join case; the
  * per-doc pre-aggregation already caps any one document's fan-in.
  *
  * Determinism across engines: per-bigram negative log-probs snap to
  * a 1e-6 grid and accumulate as exact longs (the BM25 pattern — a
  * raw double sum is FP-order-dependent, and `ln` may differ in the
  * last ULP between engines; the grid absorbs both).
  *
  * Reference scope: the reference pipeline has no statistical quality
  * filter; this extends its cleaning stage alongside the Gopher
  * repetition filters (q74) with the same oracle discipline.
  */
object LanguageModel {

  /** Split a space-joined bigram back into its two tokens (tokens are
    * whitespace-split upstream, so neither half contains a space).
    */
  private def bigramHalves(bg: Column): (Column, Column) =
    (substring_index(bg, " ", 1), substring_index(bg, " ", -1))

  /** -ln((c + alpha) / (h + alpha * V)) snapped to the 1e-6 grid as a
    * long — the unit every cross-engine sum runs in.
    */
  private def nllGrid(c: Column, h: Column, v: Column, alpha: Double): Column =
    rint(-log((c + lit(alpha)) / (h + lit(alpha) * v)) * lit(1000000.0))
      .cast("long")

  /** Trained bigram model relation: (w1, w2, c12, c1, v, nll) — bigram
    * count, head count, vocabulary size (constant column, so the model
    * is self-contained for persistence and later scoring), and the
    * snapped -ln P(w2 | w1).
    */
  def bigramLm(docs: DataFrame, textCol: String, alpha: Double = 1.0): DataFrame = {
    val (w1, w2) = bigramHalves(col("__bg"))
    // The head aggregation and the final join both consume the bigram
    // counts; persist-track so the corpus explode runs once (release
    // via Caches.releaseAll, the operator norm).
    val bigrams = graft.core.Caches.persistTracked(docs
      .select(explode(TextAnalysis.ngrams(col(textCol), 2)).as("__bg"))
      .select(w1.as("w1"), w2.as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12")))
    val heads = bigrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs
      .select(explode(Lexical.tokens(col(textCol))).as("__t"))
      .agg(countDistinct(col("__t")).as("v"))
    bigrams
      .join(heads, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("v"),
        nllGrid(col("c12"), col("c1"), col("v"), alpha).as("nll"))
  }

  /** Mean per-bigram negative log-prob of each document under the
    * model: (id, n_bigrams, avg_nll). Documents with fewer than two
    * tokens emit avg_nll 0 with n_bigrams 0 (nothing to score, kept so
    * the output is row-stable over the id domain). `avg_nll` is the
    * grid-summed mean rounded half-up to 1e-6 IN EXACT INTEGER
    * ARITHMETIC — floor((2*sum + n) / (2*n)) micro-nats, reconstructed
    * as a double only at the end — because rounding the double
    * quotient instead can land within one ULP of a .5 boundary where
    * the engines' round() implementations disagree (observed at
    * sf0.1). Lower = more typical of the training corpus (exp(avg_nll)
    * is the document perplexity).
    *
    * `alpha` must match the value the model was trained with — the
    * unseen-bigram path re-derives the smoothed probability from the
    * model's count columns.
    */
  def scoreDocs(
      docs: DataFrame,
      lm: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 1.0): DataFrame = {
    // Three consumers below (pair join, head re-derivation, vocabulary
    // aggregate) — persist-track so a non-persisted model plan (e.g.
    // bigramLm built in the same query) is not recomputed per consumer.
    val lmP = graft.core.Caches.persistTracked(lm)
    val (w1, w2) = bigramHalves(col("__bg"))
    val docBigrams = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.ngrams(col(textCol), 2)).as("__bg"))
      .select(col("id"), w1.as("w1"), w2.as("w2"))
      .groupBy(col("id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c"))
    // The model's v/c1 columns are NULL on the unseen paths after the
    // left joins; coalesce(v) from the broadcast one-row aggregate and
    // coalesce(c12/c1, 0) reconstruct the smoothed formula exactly.
    val vocab = broadcast(lmP.agg(first(col("v")).as("__v")))
    val heads = lmP.groupBy(col("w1")).agg(first(col("c1")).as("__c1"))
    val scored = docBigrams
      .join(lmP.select(col("w1"), col("w2"), col("c12")), Seq("w1", "w2"), "left")
      .join(heads, Seq("w1"), "left")
      .crossJoin(vocab)
      .select(col("id"), col("__c"),
        nllGrid(coalesce(col("c12"), lit(0L)),
          coalesce(col("__c1"), lit(0L)), col("__v"), alpha).as("__nll"))
      .groupBy(col("id"))
      .agg(sum(col("__c") * col("__nll")).as("__sum"),
        sum(col("__c")).as("n_bigrams"))
    // Exact half-up rounding of __sum / n to micro-nats without ever
    // rounding a double: num - (num mod den) is an exact multiple of
    // den, both below 2^53, so the double division is exact.
    val num = col("__sum") * lit(2L) + col("n_bigrams")
    val den = col("n_bigrams") * lit(2L)
    val microMean = (num - pmod(num, den)).cast("double") / den.cast("double")
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(microMean / lit(1000000.0), lit(0.0)).as("avg_nll"))
  }

  /** CCNet's HEAD/MIDDLE/TAIL perplexity bucketing (Wenzek et al. 2020
    * §4.3 — the split LLaMA's pipeline consumes: per language, rank
    * documents by LM score and cut into `nBuckets` equal-count
    * buckets; head = lowest perplexity = most corpus-typical): train
    * the bigram LM, score every document ([[scoreDocs]]'s exact
    * micro-nat mean), and ntile within the group — bucket 1 is head.
    * The order (nll_micro ASC, id ASC) is total, and ntile's
    * first-buckets-take-the-remainder sizing is the same in Spark and
    * DuckDB, so the assignment is engine-exact. Documents with no
    * bigrams score 0 and land in head by convention.
    *
    * Scale shape: scoring is [[scoreDocs]]'s (model-relation joins at
    * distinct-bigram grain); the ntile is a per-language total order —
    * fine while languages are few and partitions hold a language's
    * ids+scores (a skinny relation); the 100 TB escape hatch is the
    * [[Calibrate]] form (two exact percentile boundaries per language,
    * broadcast, map-side bucket compare) at the price of boundary-tie
    * rows landing by value rather than by count.
    */
  def perplexityBuckets(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      grpCol: String,
      alpha: Double = 1.0,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 1)
    val lm = bigramLm(docs, textCol, alpha)
    val scored = scoreDocs(docs, lm, textCol, idCol, alpha)
    // avg_nll is microMean/1e6 with microMean an exact integer double
    // far below 2^53, so rint(avg_nll * 1e6) recovers it exactly.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
      .orderBy(col("nll_micro").asc, col("id").asc)
    docs.select(col(idCol).as("id"), col(grpCol).as("grp"))
      .join(scored, Seq("id"))
      .withColumn("nll_micro",
        rint(col("avg_nll") * lit(1000000.0)).cast("long"))
      .withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
      .select(col("id"), col("grp"), col("n_bigrams"), col("nll_micro"),
        col("bucket"))
  }
}
