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
  * global Window. After that the only shuffle is the irreducible one:
  * token-grain rows hash-partitioned by sequence id, one
  * sort-within-group per sequence. q78's shard assignment packs at
  * document grain; this packs at TOKEN grain, crossing document
  * boundaries exactly like the training loader does.
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
    val toks = df.select(col(idCol).as("__id"), toksCol.as("__t"))
    val toksP = graft.core.Caches.persistTracked(toks)
    val offsets = Packing.exclusivePrefix(
      toksP.select(col("__id"), size(col("__t")).as("__w")), "__id", "__w")
    toksP
      .join(offsets.select(col("__id"), col("offset")), Seq("__id"))
      .select(col("__id"), col("offset"),
        posexplode(col("__t")).as(Seq("__i", "__tok")))
      .select(col("__id"), (col("offset") + col("__i")).as("__pos"),
        col("__tok"))
      .groupBy(org.apache.spark.sql.graftbridge.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("__pos")),
          org.apache.spark.sql.graftbridge.Bridge.expression(lit(seqLen.toLong))))
        .as("seq_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__tok")))),
          s => s.getField("__tok")), " ").as("seq_text"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("__id")).as("n_docs"))
  }
}
