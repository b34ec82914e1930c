package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw
  * document by how much more likely its hashed-n-gram features are
  * under a small TARGET corpus than under the raw corpus, then sample
  * top-k with Gumbel noise — selecting raw data that "looks like" the
  * target distribution without training anything.
  *
  * Mechanics, all engine-portable and deterministic:
  *  - features: word n-grams hashed into `NumBuckets` = 4096 buckets
  *    via the first 3 hex digits of md5(salt || ngram) — the same
  *    md5 discipline as [[Sampling]] (a DuckDB oracle recomputes every
  *    bucket bit-for-bit; no engine-private hash in the contract).
  *  - per-bucket log-likelihood ratio under add-1-smoothed bag-of-
  *    features multinomials: ln((tgt_b+1)/(Nt+B)) - ln((raw_b+1)/(Nr+B)),
  *    snapped to the 1e-6 micro-nat grid as a LONG ([[LanguageModel]]'s
  *    trick) so per-doc sums are exact integer math, immune to
  *    engine-specific float summation order.
  *  - per-doc log importance weight: sum of its feature occurrences'
  *    micro-ratios (multiplicity counts, per the paper's multinomial).
  *  - selection: Gumbel top-k — g = -ln(-ln(u)) with u a 16-bit md5
  *    draw, added to the log weight; top-k of (w+g) samples k docs
  *    without replacement proportionally to their importance weights
  *    (Gumbel-max), yet is a pure function of (salt, doc id).
  *
  * Scale shape: the only explode is token-grain (the irreducible grain
  * of any lexical statistic — same as the BM25 postings build); bucket
  * counts pre-aggregate map-side into <= 4096 rows per side; the
  * log-ratio relation is bucket-grain and always BROADCAST; per-doc
  * weights partial-aggregate map-side; selection is orderBy+limit
  * (TakeOrderedAndProject), never a global Window. Nothing document-
  * grain ever shuffles except the final k rows.
  */
object ImportanceSampling {

  /** 3 hex digits = 4096 feature buckets (the paper uses 10^4; a hex
    * prefix keeps the bucket key engine-portable with zero arithmetic).
    */
  val NumBuckets = 4096

  /** Hashed feature buckets of a document, with multiplicity. */
  def featureBuckets(textCol: Column, n: Int, salt: String): Column =
    transform(TextAnalysis.ngrams(textCol, n), g =>
      substring(md5(concat(lit(salt), g)), 1, 3))

  /** Corpus-level bucket occurrence counts: (bucket, cnt), <= 4096 rows. */
  def bucketCounts(docs: DataFrame, textCol: String, n: Int, salt: String): DataFrame =
    docs.select(explode(featureBuckets(col(textCol), n, salt)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-bucket micro-nat log-likelihood ratios target-vs-raw:
    * (bucket, lr_micro). Buckets unseen in either corpus take the
    * smoothed count 1. The relation is bounded by [[NumBuckets]] rows —
    * broadcast it into any scoring join.
    */
  def bucketLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      n: Int,
      salt: String): DataFrame = {
    val rawC = bucketCounts(raw, textCol, n, salt).withColumnRenamed("cnt", "rc")
    val tgtC = bucketCounts(target, textCol, n, salt).withColumnRenamed("cnt", "tc")
    val totals = rawC.agg(sum(col("rc")).as("__nr"))
      .crossJoin(tgtC.agg(sum(col("tc")).as("__nt")))
    rawC.join(tgtC, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        rint((log(coalesce(col("tc"), lit(0L)) + 1.0)
            - log(col("__nt") + lit(NumBuckets.toDouble))
            - log(coalesce(col("rc"), lit(0L)) + 1.0)
            + log(col("__nr") + lit(NumBuckets.toDouble))) * 1000000.0)
          .cast("long").as("lr_micro"))
  }

  /** Per-doc log importance weight in micro-nats: (id, w_micro) —
    * exact long sum of the doc's feature-occurrence ratios; docs with
    * no features (empty/null text) weigh 0. Callers score docs drawn
    * from the `raw` corpus the ratios were built on, so every feature
    * bucket is present in the broadcast relation.
    */
  def importanceWeights(
      docs: DataFrame,
      logRatios: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      salt: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode_outer(featureBuckets(col(textCol), n, salt)).as("bucket"))
      .join(broadcast(logRatios), Seq("bucket"), "left")
      .groupBy(col("id"))
      .agg(coalesce(sum(col("lr_micro")), lit(0L)).as("w_micro"))

  /** Deterministic micro-Gumbel perturbation from a 16-bit md5 draw:
    * rint(-ln(-ln((h+0.5)/65536)) * 1e6) as a long. Adding it to the
    * micro-nat log weight and taking top-k is Gumbel-max sampling
    * without replacement, reproducible by any engine that has md5+ln.
    */
  def gumbelMicro(key: Column, salt: String): Column = {
    val h = conv(Sampling.hashHex16(key, salt), 16, 10).cast("long")
    rint(-log(-log((h.cast("double") + 0.5) / 65536.0)) * 1000000.0).cast("long")
  }

  /** End-to-end DSIR selection: importance-weight every raw doc against
    * the target corpus, Gumbel-perturb, keep the top `k`. Output:
    * (id, w_micro, g_micro, total_micro), the k selected rows.
    */
  def resample(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      k: Int,
      salt: String): DataFrame = {
    val lrs = bucketLogRatios(raw, target, textCol, n, salt)
    importanceWeights(raw, lrs, textCol, idCol, n, salt)
      .withColumn("g_micro", gumbelMicro(col("id"), salt + ":g"))
      .withColumn("total_micro", col("w_micro") + col("g_micro"))
      .orderBy(col("total_micro").desc, col("id"))
      .limit(k)
  }
}
