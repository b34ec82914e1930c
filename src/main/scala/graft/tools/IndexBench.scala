package graft.tools

import org.apache.spark.sql.functions._

/** Amortization measurement for the materialized corpus index
  * ([[graft.ops.Dedup.writeCorpusIndex]]): per-batch incremental-dedup
  * cost with the corpus served DIRECT (re-tokenized every batch) vs
  * INDEX-BACKED (bucketed parquet scans), plus the one-time build and
  * the per-batch append. Scenario = q134/q141's (corpus = doc_id%5!=0,
  * batch = fresh + exact replays + near-miss mutations).
  *
  * Usage: IndexBench <sfDir> [reps=2]
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = graft.core.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val corpus = docs0.where(col("doc_id") % 5 =!= 0)
    val fresh = docs0.where(col("doc_id") % 5 === 0)
    val replay = corpus.where(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 200000000L).as("doc_id"), col("text"))
    val nearMiss = corpus.where(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 300000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
    val batch = fresh.unionByName(replay).unionByName(nearMiss)

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[indexbench] $label ${s}%.2f s")
      s
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit = {
      df.groupBy(col("stage")).count().collect()
      graft.core.Caches.releaseAll()
    }

    for (r <- 1 to reps) time(s"direct_batch rep$r") {
      drain(graft.ops.DedupCascade.cascadeAgainst(
        batch, corpus, "text", "doc_id", 0.8, 3))
    }
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_indexbench"
    time("index_build") {
      graft.ops.Dedup.writeCorpusIndex(corpus, "text", "doc_id", 0.8, 3,
        "graft_indexbench", base)
    }
    for (r <- 1 to reps) time(s"index_batch rep$r") {
      drain(graft.ops.DedupCascade.cascadeAgainstIndex(
        batch, "text", "doc_id", 0.8, "graft_indexbench"))
    }
    // A realistic DAILY batch (~1% of corpus): here the corpus-side
    // derivation dominates the direct form, so the index's advantage
    // is the full scan floor, not a fraction of it.
    val small = docs0.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 700000000L).as("doc_id"), col("text"))
    for (r <- 1 to reps) time(s"small_direct_batch rep$r") {
      drain(graft.ops.DedupCascade.cascadeAgainst(
        small, corpus, "text", "doc_id", 0.8, 3))
    }
    for (r <- 1 to reps) time(s"small_index_batch rep$r") {
      drain(graft.ops.DedupCascade.cascadeAgainstIndex(
        small, "text", "doc_id", 0.8, "graft_indexbench"))
    }
    time("index_append") {
      graft.ops.Dedup.appendToCorpusIndex(
        fresh.select((col("doc_id") + 500000000L).as("doc_id"), col("text")),
        "text", "doc_id", "graft_indexbench")
    }
    for (r <- 1 to reps) time(s"index_batch_after_append rep$r") {
      drain(graft.ops.DedupCascade.cascadeAgainstIndex(
        batch, "text", "doc_id", 0.8, "graft_indexbench"))
    }
    spark.stop()
  }
}
