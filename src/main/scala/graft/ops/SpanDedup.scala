package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** C4-style boilerplate REMOVAL (Raffel et al. 2020 strip any
    * line/span repeated across the corpus; CCNet dedups at paragraph
    * hash grain): where [[spanDedupStats]] emits a per-doc signal, this
    * rewrites the corpus — every segment whose text occurs in at least
    * `minDocs` distinct documents is dropped from ALL of them, and the
    * survivors reassemble in order into a cleaned text column.
    *
    * A segment is a non-overlapping `w`-token window. The corpus
    * fixture has no newlines, so the window stands in for the
    * paragraph/line grain a web corpus would split on — swap
    * [[segmentsOf]] for a newline splitter to get literal CCNet.
    *
    * Scale shape: segmentization happens SCAN-SIDE (one array
    * expression per row — no token-grain shuffle exists anywhere);
    * the boilerplate inventory shuffles skinny (xxhash64, id) tuples
    * and pre-aggregates map-side; the removal anti-join and the
    * reassembly aggregation run at segment grain, the operator's
    * irreducible output grain. Within-doc repeats survive (one doc is
    * one vote) — matching C4, which only strips CROSS-document
    * repetition.
    *
    * Output: (id, clean_text, n_segs, n_removed) — one row per input
    * document, empty-text docs included with empty clean_text.
    */
  def segmentsOf(textCol: org.apache.spark.sql.Column, w: Int)
      : org.apache.spark.sql.Column = {
    val toks = Lexical.tokens(textCol)
    // sequence(0, -1) would yield [0, -1]; guard the empty case.
    when(size(toks) <= 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0L), ceil(size(toks) / lit(w.toDouble)) - 1),
        i => array_join(slice(toks, (i * w + 1).cast("int"), lit(w)), " ")))
  }

  def removeBoilerplateSegments(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      w: Int,
      minDocs: Int): DataFrame = {
    // Segment relation feeds three consumers (inventory, removal,
    // per-doc totals); persist-track so the scan runs once.
    val seg = graft.core.Caches.persistTracked(
      docs.select(col(idCol).as("id"),
        posexplode(segmentsOf(col(textCol), w)).as(Seq("seg_idx", "seg_text"))))
    // Skinny inventory: (hash) of segments in >= minDocs distinct docs.
    val boiler = seg
      .select(xxhash64(col("seg_text")).as("__h"), col("id"))
      .groupBy(col("__h"))
      .agg(count_distinct(col("id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__h"))
    val kept = seg.withColumn("__h", xxhash64(col("seg_text")))
      .join(boiler, Seq("__h"), "left_anti")
    val re = kept.groupBy(col("id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg_text")))),
            s => s.getField("seg_text")),
          " ").as("clean_text"),
        count(lit(1)).as("__kept"))
    val ns = seg.groupBy(col("id")).agg(count(lit(1)).as("n_segs"))
    docs.select(col(idCol).as("id"))
      .join(ns, Seq("id"), "left")
      .join(re, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_segs"), lit(0L)).as("n_segs"),
        (coalesce(col("n_segs"), lit(0L)) - coalesce(col("__kept"), lit(0L)))
          .as("n_removed"))
  }

  /** EXACT substring-duplication spans (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", §4's ExactSubstr):
    * for every document, the MAXIMAL token ranges in which every
    * position lies inside some `minLen`-token window that appears
    * verbatim in at least one OTHER document — exactly the regions
    * ExactSubstr removes.
    *
    * Why this is the exact form, not an approximation: a substring of
    * length m >= minLen duplicated verbatim across documents has all of
    * its minLen-grams duplicated, and conversely a duplicated
    * minLen-gram IS a duplicated minLen-window — so "token covered by a
    * duplicated minLen-gram" characterizes "token inside a duplicated
    * run of length >= minLen" with no false positives or negatives.
    * Lee et al. compute it with a corpus suffix array, a single-machine
    * structure with poor parallel scaling; the gram-cover phrasing is
    * its shuffle-friendly equivalent (the same observation underlies
    * [[repeatedSpans]], which stops at the per-doc statistic — this
    * operator recovers the exact span GEOMETRY).
    *
    * Grouping is on the GRAM STRING, not a hash — collision-free by
    * construction, so the result is exact (the hashed form in
    * [[perDocSpanCounts]] is the skinny-shuffle scale path when a
    * ~2^-64 conflation is acceptable).
    *
    * Scale shape: one explode at gram grain (the irreducible inverted-
    * index grain) with a map-side-combinable distinct-doc count; the
    * duplicated-start probe is a semi-join; the interval merge is one
    * doc-grain window pass (classic gaps-and-islands on a running max);
    * span text reassembly is one doc-grain join. No all-pairs stage
    * exists anywhere.
    *
    * Output: (id, span_start, span_end, span_len, span_text) — token
    * positions 0-based inclusive, one row per maximal duplicated span,
    * documents with none absent.
    */
  def maximalDuplicatedSpans(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val tokTable = graft.core.Caches.persistTracked(
      docs.select(col(idCol).as("id"), Lexical.tokens(col(textCol)).as("__t")))
    val grams = graft.core.Caches.persistTracked(
      tokTable
        .where(size(col("__t")) >= minLen)
        .select(col("id"),
          explode(transform(sequence(lit(0), size(col("__t")) - minLen), i =>
            struct(i.as("pos"),
              array_join(slice(col("__t"), i + 1, lit(minLen)), " ").as("g"))))
            .as("__p"))
        .select(col("id"), col("__p.pos").as("pos"), col("__p.g").as("g")))
    val dup = grams.groupBy(col("g"))
      .agg(count_distinct(col("id")).as("__nd"))
      .where(col("__nd") >= 2)
      .select(col("g"))
    val starts = grams.join(dup, Seq("g"), "left_semi")
      .select(col("id"), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val isl = starts
      .withColumn("__pe", max(col("pos") + minLen - 1)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pe").isNull || col("pos") > col("__pe") + 1, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = isl.groupBy(col("id"), col("__isl"))
      .agg(min(col("pos")).as("__s"), (max(col("pos")) + minLen - 1).as("__e"))
    spans.join(tokTable, Seq("id"))
      .select(col("id"),
        col("__s").cast("long").as("span_start"),
        col("__e").cast("long").as("span_end"),
        (col("__e") - col("__s") + 1).cast("long").as("span_len"),
        array_join(slice(col("__t"), col("__s") + 1, col("__e") - col("__s") + 1),
          " ").as("span_text"))
  }
}
