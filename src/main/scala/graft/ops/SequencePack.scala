package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GPT-style SEQUENCE PACKING (§2.11 extensions, augmentation family):
  * concatenate the corpus in deterministic doc order with an `<eod>`
  * separator after every document and cut the token stream into
  * fixed-length training sequences — the step that turns a cleaned
  * corpus into the dense batches a decoder-only pretraining run
  * consumes (documented in Brown et al. 2020 §2.2: "we pack multiple
  * documents into a single sequence... delimited with a special end of
  * text token").
  *
  * Scale shape: the global token position is
  * doc_offset + in-doc index, where doc_offset comes from
  * [[Packing.exclusivePrefix]] — the two-phase distributed scan
  * (per-partition totals + broadcast offsets), NEVER a no-partition
  * global Window. After that the only token-grain shuffle is the
  * irreducible one: (pos, token) rows hash-partitioned by sequence id,
  * one sort-within-group per sequence — the doc id never crosses it
  * (n_docs is recovered exactly from the doc-grain offsets, see
  * packTokens). q78's shard assignment packs at document grain; this
  * packs at TOKEN grain, crossing document boundaries exactly like the
  * training loader does.
  *
  * Tokenization is the suite convention (lowercased, whitespace-split,
  * empties dropped), so the oracle recomputes every sequence string
  * with the window-form prefix at gate scale. An empty document still
  * contributes its separator — packing is total over the corpus.
  */
object SequencePack {

  /** (seq_id, seq_text, n_tokens, n_docs): the packed sequences in
    * stream order; every sequence holds exactly `seqLen` tokens except
    * the final partial one, and `n_docs` counts the documents
    * contributing at least one token (separators included with their
    * document).
    */
  def pack(
      df: DataFrame,
      textCol: String,
      idCol: String,
      seqLen: Int,
      eodToken: String = "<eod>"): DataFrame =
    packTokens(df, concat(
      filter(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
        t => t =!= lit("")),
      array(lit(eodToken))), idCol, seqLen)

  /** [[pack]] over an ALREADY-TOKENIZED column (`array<string>`,
    * separator included by the caller if wanted) — the entry point for
    * trained tokenizers ([[Bpe.tokenize]]) and any non-whitespace
    * tokenization. Same packing machinery, same output schema.
    */
  def packTokens(
      df: DataFrame,
      toksCol: org.apache.spark.sql.Column,
      idCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    def seqOf(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftbridge.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.Bridge.expression(c),
          org.apache.spark.sql.graftbridge.Bridge.expression(lit(seqLen.toLong))))
    val toks = df.select(col(idCol).as("__id"), toksCol.as("__t"))
    val toksP = graft.core.Caches.persistTracked(toks)
    val offsets = Packing.exclusivePrefix(
      toksP.select(col("__id"), size(col("__t")).as("__w")), "__id", "__w")
    val withOff = toksP
      .join(offsets.select(col("__id"), col("offset")), Seq("__id"))
    // seq_text/n_tokens: the irreducible token-grain grouping — and
    // ONLY it. n_docs used to ride this aggregate as countDistinct(id),
    // whose distinct rewrite re-keys the partial aggregation by
    // (seq, id) and drags every collect_list buffer through two extra
    // ObjectHashAggregate merge levels (measured: the pass-through
    // PartialMerge level alone was 44 s/task at sf1m — 3x the whole
    // query's floor). The doc id is projected away BEFORE the exchange.
    val seqText = withOff
      .select(col("offset"), posexplode(col("__t")).as(Seq("__i", "__tok")))
      .select((col("offset") + col("__i")).as("__pos"), col("__tok"))
      .groupBy(seqOf(col("__pos")).as("seq_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__tok")))),
          s => s.getField("__tok")), " ").as("seq_text"),
        count(lit(1)).as("n_tokens"))
    // n_docs at DOC grain: the stream concatenates documents, so each
    // doc's token positions are the contiguous [offset, offset + w) and
    // the sequences it touches are exactly seqOf(offset)..seqOf(offset
    // + w - 1) — counting docs per covered sequence IS
    // countDistinct(doc) per sequence, without shipping a doc-id column
    // through the token-grain exchange. w > 0 guards both the
    // "contributing at least one token" contract and sequence()'s
    // descending-range footgun on empty docs.
    val seqDocs = withOff
      .select(col("offset"), size(col("__t")).as("__w"))
      .where(col("__w") > 0)
      .select(explode(sequence(seqOf(col("offset")),
        seqOf(col("offset") + col("__w") - 1))).as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"))
    // Inner join is a bijection: a sequence has a token iff some doc
    // with w > 0 covers it. Both sides leave their aggregates hash-
    // partitioned by seq_id, so the join adds no exchange.
    seqText.join(seqDocs, Seq("seq_id"))
      .select(col("seq_id"), col("seq_text"), col("n_tokens"), col("n_docs"))
  }
}
