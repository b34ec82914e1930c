package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for the q84 connected-components path. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // Synthetic tiny graph first: isolates loop overhead from the
    // pair-join cost entirely.
    import spark.implicits._
    val syn = (1L to 2500L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    time("cc on synthetic 2500-edge chain") {
      graft.ops.Components.connectedComponents(syn, "id_a", "id_b", maxIter = 3).count()
    }
    graft.core.Caches.releaseAll()
    val docs = graft.core.Tables.documents(spark, dir)
    val pairs = graft.ops.Dedup.jaccardJoinExact(docs, "text", "doc_id", 0.8)
    val p = time("pairs count") { pairs.count() }
    println(s"[cc] n_pairs=$p")
    val pairsCached = graft.core.Caches.persistTracked(pairs)
    time("pairs cache") { pairsCached.count() }
    val comps = time("cc build+run") {
      val c = graft.ops.Components.connectedComponents(pairsCached, "id_a", "id_b")
      c.count()
      c
    }
    time("dedupClusters from cached pairs") {
      graft.ops.Components.dedupClusters(docs, "doc_id", pairsCached, "id_a", "id_b").count()
    }
    graft.core.Caches.releaseAll()
    time("full q84 as written") {
      graft.SparkEntry.queries("q84_dup_components")(spark, dir).count()
    }
    spark.stop()
  }
}
