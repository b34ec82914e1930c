package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staged deduplication cascade (§2.11 extension — the order every
  * production corpus pipeline actually runs its dedup family in:
  * cheap exact hashing first so the expensive similarity stages only
  * see distinct content, then near-duplicate removal over the
  * survivors; each document leaves with the stage that removed it,
  * the audit trail curation reviews demand).
  *
  * Removal rule is PAIR DOMINANCE by id: a document is removed by a
  * stage iff some LOWER-id document matches it at that stage (for the
  * exact stage this is exactly "keep min id per text"; for the near
  * stage it is the remove-if-matching-a-lower-id discipline most LSH
  * dedup deployments use). It is one-shot and engine-exact — no
  * iterative survivor recomputation; the transitive-closure variant
  * (keep one per CONNECTED COMPONENT) is [[Components.dupComponents]]
  * and stays a separate operator because its fixpoint is a different
  * (and more expensive) contract.
  *
  * Scale shape: stage 1 is one text-key shuffle (a hash of the text
  * in production — the comparison never carries two texts); stage 2
  * runs [[Dedup.jaccardJoinExact]] on the exact-distinct survivors
  * only — the cascade's point: similarity work is bounded by DISTINCT
  * content volume, immune to replication depth (the q124/q131
  * exact-dedup-first discipline applied corpus-wide).
  */
object DedupCascade {

  /** (id, stage) for EVERY input document: stage ∈ 'exact' (removed
    * by a lower-id identical text), 'near' (survived exact, removed
    * by a lower-id exact-survivor with shingle Jaccard >= threshold),
    * 'kept'.
    */
  def cascade(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8,
      shingleN: Int = 3): DataFrame = {
    val t = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    val keep = t.groupBy(col("text")).agg(min(col("id")).as("keep_id"))
    val tagged = graft.core.Caches.persistTracked(
      t.join(keep, "text")
        .select(col("id"), col("text"), (col("id") =!= col("keep_id")).as("removed_exact")))
    val survivors = tagged.where(!col("removed_exact")).select(col("id"), col("text"))
    val removedNear = Dedup.jaccardJoinExact(survivors, "text", "id", threshold, shingleN)
      .select(col("id_b").as("id")).distinct()
      .withColumn("removed_near", lit(true))
    tagged
      .join(removedNear, Seq("id"), "left_outer")
      .select(col("id"),
        when(col("removed_exact"), lit("exact"))
          .when(coalesce(col("removed_near"), lit(false)), lit("near"))
          .otherwise(lit("kept")).as("stage"))
  }
}
