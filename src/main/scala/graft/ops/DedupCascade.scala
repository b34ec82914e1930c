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

  /** Incremental (R-S) form of [[cascade]] — the shape a pipeline runs
    * on every append: stage TODAY'S batch against the STANDING corpus,
    * never the corpus against itself. A batch document leaves as
    * 'exact_corpus' (its text already exists in the corpus — left-semi
    * on the content key, the cheap stage), else 'near_corpus' (shingle
    * Jaccard >= threshold against some corpus document —
    * [[Dedup.jaccardJoinAgainst]], prefix-filtered: the corpus side
    * explodes only eps-guarded prefixes, no batch×corpus all-pairs),
    * else 'kept'. In-batch duplicates are [[cascade]]'s job — run it
    * on the batch first; the two compose into the daily-run discipline
    * (batch self-dedup → batch-vs-corpus → append).
    *
    * Scale shape: the corpus-side token relation is a pure column
    * derivation a deployment materializes once per corpus version;
    * per-append cost is batch-sized joins against it.
    */
  def cascadeAgainst(
      incoming: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8,
      shingleN: Int = 3): DataFrame = {
    val in = graft.core.Caches.persistTracked(
      incoming.select(col(idCol).as("id"), col(textCol).as("text")))
    val co = corpus.select(col(idCol).as("id"), col(textCol).as("text"))
    val corpusTexts = co.select(col("text")).distinct()
    val exactHit = in.join(corpusTexts, Seq("text"), "left_semi")
      .select(col("id")).withColumn("removed_exact", lit(true))
    val survivors = in.join(corpusTexts, Seq("text"), "left_anti")
    val nearHit = Dedup.jaccardJoinAgainst(
        survivors.select(col("id"), col("text")), co, textCol = "text",
        idCol = "id", threshold, shingleN)
      .select(col("id_in").as("id")).distinct()
      .withColumn("removed_near", lit(true))
    in.select(col("id"))
      .join(exactHit, Seq("id"), "left_outer")
      .join(nearHit, Seq("id"), "left_outer")
      .select(col("id"),
        when(coalesce(col("removed_exact"), lit(false)), lit("exact_corpus"))
          .when(coalesce(col("removed_near"), lit(false)), lit("near_corpus"))
          .otherwise(lit("kept")).as("stage"))
  }

  /** [[cascadeAgainst]] with the standing corpus served by a
    * [[Dedup.writeCorpusIndex]] materialization instead of a corpus
    * DataFrame: the exact stage semi/anti-joins the bucketed `_texts`
    * table, the near stage runs [[Dedup.jaccardJoinAgainstIndex]] —
    * identical output (q141 pins it against q134's full-value DuckDB
    * oracle), zero corpus re-derivation per batch. This is the daily
    * loop at scale: `writeCorpusIndex` once per corpus version,
    * `cascadeAgainstIndex` + [[Dedup.appendToCorpusIndex]] per batch.
    */
  def cascadeAgainstIndex(
      incoming: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8,
      tablePrefix: String = "graft_corpus_index"): DataFrame = {
    val spark = incoming.sparkSession
    val in = graft.core.Caches.persistTracked(
      incoming.select(col(idCol).as("id"), col(textCol).as("text")))
    val corpusTexts = spark.table(s"${tablePrefix}_texts")
    val exactHit = in.join(corpusTexts, Seq("text"), "left_semi")
      .select(col("id")).withColumn("removed_exact", lit(true))
    val survivors = in.join(corpusTexts, Seq("text"), "left_anti")
    val nearHit = Dedup.jaccardJoinAgainstIndex(
        survivors.select(col("id"), col("text")), textCol = "text",
        idCol = "id", threshold, tablePrefix)
      .select(col("id_in").as("id")).distinct()
      .withColumn("removed_near", lit(true))
    in.select(col("id"))
      .join(exactHit, Seq("id"), "left_outer")
      .join(nearHit, Seq("id"), "left_outer")
      .select(col("id"),
        when(coalesce(col("removed_exact"), lit(false)), lit("exact_corpus"))
          .when(coalesce(col("removed_near"), lit(false)), lit("near_corpus"))
          .otherwise(lit("kept")).as("stage"))
  }
}
