package graft.tools

import org.apache.spark.sql.functions._

/** Cost-anatomy probe for [[graft.ops.Components.connectedComponents]]:
  * `ClosureProbe <sfDir> [reps]` materializes the q149 ensemble edge
  * set once (tiny at gate scale — the signals' cost is excluded), then
  * times the closure alone, repeatedly — the fixed per-round overhead
  * (jobs, codegen, AQE re-planning) is the whole cost at sf0.1, where
  * the edge relation is a few hundred rows; the probe separates that
  * overhead from the signal arms so closure-implementation changes can
  * be A/B'd without re-measuring the rest of the operator.
  */
object ClosureProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    val exact = graft.ops.EnsembleDedup.exactContentEdges(docs, "text", "doc_id")
    val jac = graft.ops.Dedup.jaccardJoinExact(docs, "text", "doc_id", 0.8)
    val cos = graft.ops.Dedup.embeddingNearDuplicates(
      emb, "embedding", "vec_id", "label", 0.4)
    // Materialize the pair set into a plain cached relation so every
    // closure rep pays only closure work.
    val pairs = exact.select(col("id_a"), col("id_b"))
      .unionByName(jac.select(col("id_a"), col("id_b")))
      .unionByName(cos.select(col("id_a"), col("id_b")))
      .persist()
    val nPairs = pairs.count()
    println(s"[pairs] n=$nPairs")
    graft.core.Caches.releaseAll()
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val comps = graft.ops.Components.connectedComponents(pairs, "id_a", "id_b")
      val r = comps.agg(count(lit(1)), countDistinct(col("component"))).head()
      println(f"[closure] rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(vertices=${r.getLong(0)} components=${r.getLong(1)})")
      graft.core.Caches.releaseAll()
    }
    spark.stop()
  }
}
