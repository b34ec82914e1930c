package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document repeated-span detection (§2.11 extensions): find
  * k-token spans that occur in more than one document and score each
  * document by the fraction of its spans that are corpus-duplicated —
  * the distributed counterpart of exact-substring training-data dedup
  * (Lee et al. 2021, "Deduplicating Training Data Makes Language
  * Models Better", which builds a suffix array to find 50-token
  * repeats; a suffix array is a single-machine structure, so the
  * cluster form is rolling k-token windows + a hash aggregation).
  *
  * Scale shape: one explode of the corpus at span grain — the same
  * irreducible grain as an inverted-index build — after which every
  * shuffled row is a SKINNY (64-bit hash, id, count) tuple, never the
  * span text: spans are hashed scan-side (`xxhash64`), the per-doc
  * pre-aggregation bounds the join input at (doc, distinct-span)
  * grain, and both aggregations are map-side combinable. No all-pairs
  * join and no string shuffle exist anywhere in the plan. Collisions:
  * two distinct spans sharing an xxhash64 value would be conflated;
  * at 2^64 hash space the expected collision count stays < 1 up to
  * ~10^9 distinct spans per partition-disjoint corpus slice, the
  * standard trade the MinHash/SimHash family in [[Dedup]] documents.
  *
  * Reference scope: the reference has no substring-level dedup; this
  * extends its cleaning stage (kfai/transformers) the way the §2.11
  * dedup family does, with the same oracle discipline.
  */
object SpanDedup {

  /** Per-(doc, span-hash) occurrence counts — the skinny relation both
    * aggregations and the probe join run on: (id, __h, __c).
    */
  private def perDocSpanCounts(
      docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.ngrams(col(textCol), k)).as("__span"))
      .select(col("id"), xxhash64(col("__span")).as("__h"))
      .groupBy(col("id"), col("__h"))
      .agg(count(lit(1)).as("__c"))

  /** Span-level inventory of spans present in at least `minDocs`
    * distinct documents: (span_hash, n_docs, n_occ). `n_occ` counts
    * every occurrence (within-doc repeats included); `n_docs` counts
    * documents.
    */
  def repeatedSpans(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    perDocSpanCounts(docs, textCol, idCol, k)
      .groupBy(col("__h").as("span_hash"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__c")).as("n_occ"))
      .where(col("n_docs") >= minDocs)
  }

  /** Per-document duplication profile: (id, n_spans, dup_spans,
    * dup_frac, flagged). `n_spans` is the document's span count
    * (tokens - k + 1, floored at 0), `dup_spans` the occurrences whose
    * span also appears in >= `minDocs` - 1 OTHER documents, `dup_frac`
    * their ratio (0 for span-less docs), `flagged` whether the ratio
    * exceeds `flagFrac`. Documents with no duplicated span still emit
    * a row, so the result is row-stable over the input id domain.
    */
  def spanDedupStats(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      minDocs: Int = 2,
      flagFrac: Double = 0.5): DataFrame = {
    // Both the repeated-hash set and the probe join consume this
    // relation; persist-track it so the explode + first aggregation
    // run once (release via Caches.releaseAll, the operator norm).
    val perDoc = graft.core.Caches.persistTracked(
      perDocSpanCounts(docs, textCol, idCol, k))
    // Distinct-doc count per hash over the already-unique (id, __h)
    // grain; only the qualifying hashes flow into the probe join.
    val repeated = perDoc
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__h"))
    val dupPerDoc = perDoc
      .join(repeated, "__h")
      .groupBy(col("id"))
      .agg(sum(col("__c")).as("dup_spans"))
    // Total span count is a one-pass per-row statistic — no reason to
    // re-aggregate the exploded relation for it.
    docs
      .select(col(idCol).as("id"),
        TextAnalysis.ngramRepetition(col(textCol), k).getItem(0).as("n_spans"))
      .join(dupPerDoc, Seq("id"), "left")
      .select(col("id"), col("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"))
      .withColumn("dup_frac",
        round(when(col("n_spans") === 0, lit(0.0))
          .otherwise(col("dup_spans").cast("double") / col("n_spans")), 4))
      .withColumn("flagged", col("dup_frac") > flagFrac)
  }
}
