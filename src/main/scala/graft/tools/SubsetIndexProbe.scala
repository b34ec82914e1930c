package graft.tools

import org.apache.spark.sql.functions._

/** A/B probe for the q181 subset SemDeDup index: times the
  * catalog-backed dedupClustersIndexed against the in-memory
  * dedupClustersIndexedInMemory on the same scale-adaptive subset,
  * with per-phase attribution for the in-memory path. Usage:
  * SubsetIndexProbe <sfDir> [reps]
  */
object SubsetIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables.embeddings(spark, dir)
    val nEmb = emb.count()
    val mod = math.max(1L, nEmb / 1000L)
    val sub = emb.where(col("vec_id") % mod === 0)
    val nSub = math.max(1L, sub.count())
    val kCap = math.min(nSub, Int.MaxValue.toLong).toInt
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[subset] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"--- rep $rep (nSub=$nSub)")
      t("catalog_path") {
        val prefix = s"probe_sub_${System.nanoTime()}"
        val base = s"${System.getProperty("java.io.tmpdir")}/$prefix"
        graft.ops.Components.dedupClustersIndexed(sub, "embedding",
          "vec_id", threshold = 0.4, nlist = 16, nprobe = 16, k = kCap,
          shortlist = kCap, m = 4, ksub = 16, dim = 64,
          tablePrefix = prefix, basePath = base).count()
      }
      graft.core.Caches.releaseAll()
      t("inmemory_path") {
        graft.ops.Components.dedupClustersIndexedInMemory(sub, "embedding",
          "vec_id", threshold = 0.4, nlist = 16, nprobe = 16, k = kCap,
          shortlist = kCap, m = 4, ksub = 16, dim = 64).count()
      }
      graft.core.Caches.releaseAll()
      // Phase attribution for the in-memory path.
      val rel = t("  build_relations")(graft.ops.VectorIndex
        .buildIvfPqRelations(sub, "embedding", "vec_id",
          nlist = 16, m = 4, ksub = 16, dim = 64, refineIters = 1))
      t("  materialize_codes")(rel.codes.count())
      val hits = t("  search")(graft.ops.VectorIndex.searchIvfAdcRelations(
        sub.select(col("vec_id").as("__qid"), col("embedding").as("__qemb")),
        "__qemb", "__qid", k = kCap, nprobe = 16, shortlist = kCap, rel))
      val pairs = hits
        .where(col("vec_id") =!= col("__qid") && col("score") >= 0.4)
        .select(col("__qid").as("id_a"), col("vec_id").as("id_b"))
      t("  closure")(graft.ops.Components.dedupClusters(
        sub, "vec_id", pairs, "id_a", "id_b").count())
      graft.core.Caches.releaseAll()
    }
    spark.stop()
  }
}
