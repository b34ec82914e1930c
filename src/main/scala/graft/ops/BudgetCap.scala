package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source token-budget corpus selection (§2.11 extension — the
  * mixture-construction step that caps how much any one source
  * contributes to a training run: rank each source's documents by a
  * deterministic priority and keep the prefix whose cumulative token
  * count fits the budget, so over-crawled domains can't drown the mix;
  * the per-domain cap discipline of C4/Gopher-style corpus curation).
  *
  * Exactness: token counts are integers from the corpus-wide
  * tokenizer, the priority order ((n_tokens DESC, id) — id unique) is
  * total, and the running sum is an explicit ROWS frame, so the
  * kept-set boundary is bit-identical on any engine. All documents are
  * emitted with a `kept` flag (the decision IS the output — downstream
  * both halves matter: kept feeds the mix, dropped feeds the reserve).
  *
  * Scale shape: one shuffle — the per-source ordered prefix sum
  * partitions by source. Within a source the running sum is sequential
  * BY DEFINITION (each row's decision depends on every higher-priority
  * row), which is fine when sources number thousands and fit a
  * partition each; for one mega-source at 100 TB the same decision
  * decomposes exactly like [[Packing.packShards]]'s two-phase scan:
  * range-partition by the priority key, per-partition local sums, one
  * driver-side cumulative offset per partition (#partitions longs),
  * then a map-side `offset + local_cum <= budget` — same answer, no
  * single-partition sort. This operator keeps the window form because
  * the group key bounds the sort; the two-phase form is the documented
  * escape hatch, not a different semantic.
  */
object BudgetCap {

  /** (grp, id, n_tokens, cum_tokens, kept) for EVERY document:
    * `cum_tokens` is the running token total in priority order
    * (longest-first, id tie-break) within the document's group, and
    * `kept` marks the budget-fitting prefix (a document is kept iff
    * the running total THROUGH it stays within `budgetTokens`).
    */
  def tokenBudgetCap(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      grpCol: String,
      budgetTokens: Long): DataFrame =
    capByCount(docs, TextAnalysis.tokenCount(col(textCol)), idCol, grpCol,
      budgetTokens)

  /** [[tokenBudgetCap]] parameterized over an arbitrary token-COUNT
    * column — the hook that runs the cap on a TRAINED tokenizer's
    * output instead of the whitespace convention (pass
    * `size(Bpe.tokenize(...))`, or `size` of any `array<string>`
    * tokens column). Same one-shuffle ordered-prefix shape, same
    * output contract.
    */
  def capByCount(
      docs: DataFrame,
      nTokensCol: Column,
      idCol: String,
      grpCol: String,
      budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("n_tokens").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(grpCol).as("grp"), col(idCol).as("id"),
        nTokensCol.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("kept", col("cum_tokens") <= lit(budgetTokens))
  }
}
