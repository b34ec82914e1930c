package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax per-language training-budget allocation (§2.11 extensions,
  * mixture family) — Chung et al. 2023, "UniMax: Fairer and More
  * Effective Language Sampling for Large-Scale Multilingual
  * Pretraining": given a total token budget B and per-language corpus
  * sizes, allocate budget as uniformly as possible across languages
  * while capping any language at `epochCap` epochs of its own data —
  * the published alternative to temperature sampling
  * ([[graft.ops.ImportanceSampling]]'s q83 family) that prevents both
  * head-language domination AND tail-language over-epoching.
  *
  * The sequential waterfill (the paper's Algorithm 1: visit languages
  * by ascending size; give each min(cap, remaining/languages_left))
  * has a closed form because once a language takes the equal share,
  * every later (larger) one does too: the capped set is exactly the
  * ascending-capacity PREFIX where cap_i * (n - i + 1) <= B - C_{i-1}
  * (C = the running capacity sum) — the predicate is monotone (if it
  * fails at i it fails at every j > i, since caps ascend), so the
  * whole allocation is ONE window pass over the language-grain
  * relation, no driver loop and no iteration.
  *
  * Integer-exact convention (the paper works in reals; this grid IS
  * the engine contract): the budget is `sum_caps * budgetNum DIV
  * budgetDen`; the uncapped share is floor((B - C_k) / (n - k)) with
  * the remainder distributed one token each to the FIRST `rem`
  * uncapped languages in allocation order — every quantity a BIGINT,
  * the prefix test cross-multiplied in DECIMAL(38,0)/HUGEINT so no
  * product can overflow at any corpus size. Deterministic total order:
  * (capacity ASC, group ASC).
  *
  * Scale shape: ONE map-side-combinable token-count aggregation over
  * the corpus (the only corpus-sized stage), then windows over the
  * LANGUAGE-grain relation — bounded by construction (languages number
  * dozens), the [[BudgetCap]] single-partition-window justification.
  * Output keeps every language with its decision: (grp, n_tokens,
  * cap_tokens, alloc_tokens, capped) — alloc sums exactly to B
  * whenever any language is uncapped, and to sum_caps when B exceeds
  * total capacity.
  */
object UniMax {

  /** Suite-convention token count of a text column. */
  private def nTokens(text: Column): Column =
    size(filter(split(lower(trim(coalesce(text, lit("")))), "\\s+"),
      t => t =!= lit(""))).cast("long")

  /** Allocate `sum_caps * budgetNum DIV budgetDen` tokens across the
    * values of `grpCol` with an `epochCap`-epoch per-group ceiling.
    */
  def allocate(
      docs: DataFrame,
      grpCol: String,
      textCol: String,
      epochCap: Int,
      budgetNum: Long,
      budgetDen: Long): DataFrame = {
    require(epochCap >= 1 && budgetNum >= 0 && budgetDen >= 1)
    val g = docs
      .select(col(grpCol).as("grp"), nTokens(col(textCol)).as("__nt"))
      .groupBy(col("grp"))
      .agg(sum(col("__nt")).as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens") * lit(epochCap.toLong))
    val tot = g.agg(
      sum(col("cap_tokens")).as("__sum_cap"),
      count(lit(1)).as("__n"))
      .withColumn("__budget", expr(
        s"CAST((CAST(__sum_cap AS DECIMAL(38,0)) * $budgetNum) DIV " +
          s"$budgetDen AS BIGINT)"))
    // Language-grain relation: the global windows are bounded by the
    // group cardinality, never corpus-proportional (BudgetCap's
    // justification).
    val ord = Window.orderBy(col("cap_tokens").asc, col("grp").asc)
    val ranked = g.crossJoin(broadcast(tot))
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__cprev", coalesce(
        sum(col("cap_tokens")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped", expr(
        "CAST(cap_tokens AS DECIMAL(38,0)) * (__n - __i + 1) <= " +
          "CAST(__budget - __cprev AS DECIMAL(38,0))"))
    val caps = ranked.agg(
      coalesce(sum(when(col("capped"), col("cap_tokens"))), lit(0L))
        .as("__ck"),
      count(when(col("capped"), lit(1))).as("__k"))
    ranked.crossJoin(broadcast(caps))
      .withColumn("__base", expr(
        "CASE WHEN __n > __k THEN (__budget - __ck) DIV (__n - __k) " +
          "ELSE CAST(0 AS BIGINT) END"))
      .withColumn("__rem", expr(
        "CASE WHEN __n > __k THEN (__budget - __ck) % (__n - __k) " +
          "ELSE CAST(0 AS BIGINT) END"))
      .select(col("grp"), col("n_tokens"), col("cap_tokens"),
        when(col("capped"), col("cap_tokens"))
          .otherwise(col("__base") +
            when(col("__i") - col("__k") <= col("__rem"), lit(1L))
              .otherwise(lit(0L)))
          .as("alloc_tokens"),
        col("capped"))
  }
}
