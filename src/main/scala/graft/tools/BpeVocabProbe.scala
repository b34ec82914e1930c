package graft.tools

import org.apache.spark.sql.functions._

/** Large-vocabulary BPE tokenize cost anatomy:
  * `BpeVocabProbe <sfDir> <numMerges> [reps=2]` trains a merge table
  * of the requested size over the documents table (training exhausts
  * early when the vocabulary fully merges — the effective merge count
  * is printed), then times BOTH tokenize paths end-to-end (full token
  * count materialization, cold + warm):
  *
  *   - native: [[graft.ops.Bpe.tokenize]] — per-JVM word cache, each
  *     distinct word pays the merge fold once per JVM (per cache
  *     lifetime); the right call at moderate vocabularies.
  *   - dict: [[graft.ops.Bpe.tokenizeByDict]] — distinct words pay the
  *     fold ONCE in a distributed dictionary stage, occurrences
  *     resolve by word join; cost ∝ |vocab| × |merges| + one
  *     token-grain shuffle, independent of JVM count and cache
  *     pressure — the 50k-merge / 100 TB posture.
  *
  * The paths are pinned value-equal (TrainSpec + q165's oracle); this
  * probe measures the crossover, feeding FLOORS.json.
  */
object BpeVocabProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numMerges = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)

    var t0 = System.nanoTime()
    val merges = graft.ops.Bpe.train(docs, "text", numMerges)
    println(f"[bpeprobe] train requested=$numMerges effective=${merges.length} " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")

    for (rep <- 1 to reps) {
      t0 = System.nanoTime()
      val nNative = docs
        .select(size(graft.ops.Bpe.tokenize(col("text"), merges)).as("n"))
        .agg(sum(col("n"))).collect()(0).getLong(0)
      println(f"[bpeprobe] native rep$rep tokens=$nNative " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.core.Caches.releaseAll()
    }
    for (rep <- 1 to reps) {
      t0 = System.nanoTime()
      val nDict = graft.ops.Bpe.tokenizeByDict(docs, "text", "doc_id", merges)
        .select(size(col("tokens")).as("n"))
        .agg(sum(col("n"))).collect()(0).getLong(0)
      println(f"[bpeprobe] dict rep$rep tokens=$nDict " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.core.Caches.releaseAll()
    }
    spark.stop()
  }
}
