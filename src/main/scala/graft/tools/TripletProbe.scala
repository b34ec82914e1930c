package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** A/B cost anatomy for the ANN triplet miner's NEGATIVE arm (q167):
  * times hardTripletsAnn (exact cosine over every probed candidate —
  * volume anchors x corpus x nprobe/nlist) against hardTripletsAnnAdc
  * at a production shortlist (ADC over PQ codes first, exact rescore
  * only the shortlist — volume anchors x shortlist).
  *
  * Usage: TripletProbe <sfDir> [shortlist=256] [reps=2]. Parameters
  * mirror q167 (threshold 0.4, nlist 16, nprobe 4, k 64, adaptive
  * planes); counts printed so recall loss at the shortlist is visible
  * next to the time.
  */
object TripletProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shortlist = if (args.length > 1) args(1).toInt else 256
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.where(col("vec_id") % 50 === 0)
    val nRows = emb.count()
    val np = math.max(6, math.ceil(
      math.log(math.max(1L, nRows).toDouble / 250.0) / math.log(2.0)).toInt)
    val tmp = java.nio.file.Files.createTempDirectory("graft-tripprobe").toString
    val _ = np // positive arm excluded: identical in both variants
    // Index builds happen ONCE per corpus version in production —
    // timed separately so the search A/B is not diluted by them.
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[triplet] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("build_ivf") {
      graft.ops.VectorIndex.writeIvfIndex(emb, "embedding", "vec_id",
        nlist = 16, refineIters = 1,
        tablePrefix = "t_probe_ivf", basePath = s"$tmp/ivf")
    }
    timed("build_ivfpq") {
      graft.ops.VectorIndex.writeIvfPqIndex(emb, "embedding", "vec_id",
        nlist = 16, m = 4, ksub = 16, dim = 64,
        tablePrefix = "t_probe_pq", basePath = s"$tmp/pq")
    }
    val q = anchors.select(col("vec_id").as("__qid"),
      col("embedding").as("__qemb"))
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.ops.VectorIndex.searchIvfIndex(
        q, "__qemb", "__qid", k = 64, nprobe = 4,
        tablePrefix = "t_probe_ivf").count()
      println(f"[triplet] search_exact rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s ($n hits)")
      graft.core.Caches.releaseAll()
      val t1 = System.nanoTime()
      val na = graft.ops.VectorIndex.searchIvfIndexAdc(
        q, "__qemb", "__qid", k = 64, nprobe = 4, shortlist = shortlist,
        tablePrefix = "t_probe_pq").count()
      println(f"[triplet] search_adc_sl$shortlist rep$r ${(System.nanoTime() - t1) / 1e9}%.2f s ($na hits)")
      graft.core.Caches.releaseAll()
    }
    spark.stop()
  }
}
