package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CONTRASTIVE TRIPLET mining (§2.11 extensions, training-data family):
  * per anchor vector, its strongest same-block POSITIVE (cosine at or
  * above the positive threshold) and its HARDEST NEGATIVE (the
  * highest-cosine neighbor still BELOW it) — the
  * (anchor, positive, hard-negative) triplets contrastive embedding
  * training consumes (InfoNCE/triplet losses; E5 and SimCSE both
  * document that hard negatives, not random ones, carry the training
  * signal — the random-negative form is [[Sampling]]'s q105 op).
  *
  * Determinism: candidate ranking is (cosine DESC, id ASC) — the
  * q28/q29 tie discipline — so the mined triplets are reproducible and
  * the DuckDB oracle recomputes them exactly (cosines reported on the
  * 4-decimal grid, the established cross-engine float contract).
  *
  * Scale shape: candidate pairs are BLOCKED (label here, exactly
  * [[Dedup.embeddingNearDuplicates]]'s shape — pair volume is
  * Σ|block|², never |corpus|²); both extremes come from ONE
  * row_number window family over the anchor partition. At corpus
  * scale the block swaps for the LSH bucket
  * ([[Dedup.embeddingNearDuplicatesLsh]]) for positives and an ANN
  * probe ([[VectorIndex]]) for hard negatives — same downstream
  * ranking, documented trade (banding can miss a borderline hardest
  * negative; the threshold semantics are unchanged).
  */
object ContrastivePairs {

  /** One triplet per anchor that has BOTH a positive and a negative:
    * (anchor_id, positive_id, negative_id, pos_cos, neg_cos) with
    * cosines rounded to 4 decimals. Anchors missing either side drop
    * (inner join) — a training set never pads half-triplets.
    */
  def hardTriplets(
      df: DataFrame,
      embCol: String,
      idCol: String,
      blockCol: String,
      posThreshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.vecCosine
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("anchor_id"),
      col(embCol).as("__ea"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("__idb"),
      col(embCol).as("__eb"))
    // The blocked self-join + cosine is the dominant Σ|block|² stage and
    // BOTH extreme windows consume it — persist so it executes once per
    // query (released by the caller's Caches.releaseAll, the operator
    // norm). TrainSpec pins the physical plan: the cosine join lives
    // only inside the cached relation.
    val pairs = graft.core.Caches.persistTracked(
      a.join(b, Seq("blk"))
        .where(col("anchor_id") =!= col("__idb"))
        .select(col("anchor_id"), col("__idb"),
          vecCosine(col("__ea"), col("__eb")).as("__c")))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("__c").desc, col("__idb").asc)
    val pos = pairs.where(col("__c") >= posThreshold)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("anchor_id"), col("__idb").as("positive_id"),
        round(col("__c"), 4).as("pos_cos"))
    val neg = pairs.where(col("__c") < posThreshold)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("anchor_id"), col("__idb").as("negative_id"),
        round(col("__c"), 4).as("neg_cos"))
    pos.join(neg, Seq("anchor_id"))
      .select(col("anchor_id"), col("positive_id"), col("negative_id"),
        col("pos_cos"), col("neg_cos"))
  }
}
