package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift scoring between corpus slices and the corpus
  * (§2.11 extension — the mixture monitor: when a source's token
  * distribution drifts away from the corpus (or a new crawl drifts
  * from the last one), its mixture weight and quality thresholds need
  * re-tuning. KL(source ‖ corpus) over unigram distributions is the
  * standard scalar for that; chi-square is the fully-rational
  * companion that needs no logarithm at all).
  *
  * Exactness: with c_st = source term count, n_s = source total,
  * c_t = corpus term count, n = corpus total,
  *   KL(s ‖ corpus) = (1/n_s) * Σ_t c_st * ln((c_st * n) / (n_s * c_t))
  * Every per-term log snaps to the 1e-6 micro grid (`rint(ln(r)*1e6)`,
  * the q82 precedent — DuckDB's round_even lands identically), the
  * weighted sum accumulates in int64, and the final division is
  * IntegralDivide — so kl_micro reproduces digit-for-digit on any
  * engine. Terms absent from the source contribute 0 (the 0·ln0 = 0
  * convention); terms absent from the corpus cannot exist (the corpus
  * includes the source).
  *
  * Scale shape: one token-grain explode, aggregations at
  * (group, term) and term grain; the corpus-term relation joins the
  * per-group relation ON THE TERM (skinny int/long tuples), and the
  * corpus totals row is a broadcast scalar. Everything partial-
  * aggregates map-side; nothing global.
  */
object Drift {

  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** Per-group KL divergence from the whole-corpus unigram
    * distribution, in micro-nats: (grp, n_terms, n_tokens, kl_micro).
    * `n_terms` = distinct terms in the group, `n_tokens` = its token
    * total. kl_micro >= 0 up to grid rounding (each micro-ln rounds
    * half-even, so a tiny negative total is possible only when the
    * distributions are near-identical — itself the signal).
    */
  def klDrift(
      docs: DataFrame,
      textCol: String,
      groupCol: String): DataFrame = {
    val toks = graft.core.Caches.persistTracked(
      docs.select(col(groupCol).as("grp"),
        explode(Lexical.tokens(col(textCol))).as("term")))
    val byGrp = toks.groupBy(col("grp"), col("term")).agg(count(lit(1)).as("c_st"))
    val byTerm = toks.groupBy(col("term")).agg(count(lit(1)).as("c_t"))
    val totals = toks.agg(count(lit(1)).as("n")) // broadcast 1-row scalar
    val grpTotals = byGrp.groupBy(col("grp"))
      .agg(sum(col("c_st")).as("n_s"), count(lit(1)).as("n_terms"))
    val microLn = rint(
      log((col("c_st") * col("n")).cast("double") /
        (col("n_s") * col("c_t")).cast("double")) * lit(1000000.0)).cast("long")
    byGrp.join(byTerm, "term")
      .join(grpTotals, "grp")
      .crossJoin(broadcast(totals))
      .groupBy(col("grp"), col("n_terms"), col("n_s"))
      .agg(sum(col("c_st") * microLn).as("__w"))
      .select(col("grp"), col("n_terms"), col("n_s").as("n_tokens"),
        intDiv(col("__w"), col("n_s")).as("kl_micro"))
  }
}
