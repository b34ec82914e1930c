package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PREFERENCE-PAIR construction (§2.11 extensions, post-training data
  * family): turn a scored corpus into (chosen, rejected) training pairs
  * for preference optimization — the data-prep step RLHF reward
  * modeling and DPO consume (Ouyang et al. 2022 collect ranked
  * completions per prompt; Rafailov et al. 2023 train directly on the
  * (chosen, rejected) pairs). Grouping key = the prompt surrogate
  * (here: any column set); chosen/rejected = the group's best/worst
  * row under a deterministic score with a total-order tie-break
  * (score, then id), so the pairing is reproducible across engines and
  * runs.
  *
  * Margin discipline: pairs with score margin below `minMargin` are
  * dropped — a pair whose sides the scorer cannot separate carries no
  * preference signal (the annotator-agreement threshold in ranked-
  * completion collection). Degenerate groups (single row, or all
  * scores equal, where both extremes resolve to the same min-id row)
  * drop out via the chosen != rejected guard.
  *
  * Scale shape: ONE hash shuffle at group grain; both extremes come
  * from row_number windows over the SAME partitioning (two in-memory
  * sorts of each group, no second shuffle), and the best/worst join is
  * group-grain (one row per group per side). Nothing touches text —
  * callers score first (e.g. [[HashedClassifier.score]] at scan cost,
  * or [[LinearTrainer.score]] with trained weights) and pass the
  * skinny (keys, id, score) relation.
  */
object PreferencePairs {

  /** One pair per group: (keyCols..., chosen_id, rejected_id,
    * chosen_score, rejected_score, margin), margin >= minMargin only.
    */
  def fromScores(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      scoreCol: String,
      minMargin: Long = 1L): DataFrame =
    fromScoresTopK(df, keyCols, idCol, scoreCol, pairsPerGroup = 1, minMargin)
      .drop("pair_rank")

  /** k pairs per group — pair i = (i-th best, i-th worst), the
    * outside-in rank pairing real DPO collection mines from ranked
    * completions (rank 1 vs rank n, 2 vs n-1, …): maximal margins
    * first, every row used at most once per side. Output adds
    * `pair_rank` (1..k). Pairs whose sides cross (i past the middle of
    * a small group: chosen score <= rejected score + minMargin) and
    * self-pairs drop via the same margin/identity guards — so k is an
    * UPPER bound, group size the natural limiter.
    *
    * Scale shape identical to the single-pair form: the two row_number
    * windows share ONE group-grain hash partitioning (two in-group
    * sorts, no extra shuffle), rows beyond rank k prune BEFORE the
    * group-grain pair join (WindowGroupLimit pushes the k-filter into
    * the sort at scan side).
    *
    * Scores and margin keep the input column's type UNTRUNCATED — a
    * long cast here would silently drop near-tie pairs under a
    * fractional scorer (5.9 vs 5.1 truncates to margin 0 < minMargin)
    * and misreport the pair's scores. Integral scorers (the micro-unit
    * convention) are unaffected.
    */
  def fromScoresTopK(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      scoreCol: String,
      pairsPerGroup: Int,
      minMargin: Long = 1L): DataFrame = {
    require(keyCols.nonEmpty, "need at least one grouping key")
    require(pairsPerGroup >= 1,
      s"pairsPerGroup must be >= 1, got $pairsPerGroup")
    val keys = keyCols.map(col)
    val wBest = Window.partitionBy(keys: _*)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wWorst = Window.partitionBy(keys: _*)
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val ranked = df.select(keys :+ col(idCol) :+ col(scoreCol): _*)
      .withColumn("__rb", row_number().over(wBest))
      .withColumn("__rw", row_number().over(wWorst))
    val best = ranked.where(col("__rb") <= pairsPerGroup)
      .select(keys :+ col("__rb").as("pair_rank") :+
        col(idCol).as("chosen_id") :+
        col(scoreCol).as("chosen_score"): _*)
    val worst = ranked.where(col("__rw") <= pairsPerGroup)
      .select(keys :+ col("__rw").as("pair_rank") :+
        col(idCol).as("rejected_id") :+
        col(scoreCol).as("rejected_score"): _*)
    best.join(worst, keyCols :+ "pair_rank")
      .where(col("chosen_id") =!= col("rejected_id"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .where(col("margin") >= minMargin)
  }
}
