package graft.tools

import org.apache.spark.sql.functions._

/** Repeated-run profiler for individual SparkEntry queries:
  * `ProfileQ <sfDir> <query>...` times each named query twice (cold +
  * warm) with the bench's full-row hash materialization, so scaling
  * investigations can separate per-query cost from suite effects.
  *
  * Session-SHARED relations (Caches.shared — the support-pair
  * discovery) are released between reps too, so every rep reports the
  * query's STANDALONE cost; run the consumers through Bench with
  * SPARK_GRAFT_ONLY to measure the shared-subtree suite effect.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
      println(f"[profile] $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.core.Caches.releaseAll()
      graft.core.Caches.releaseShared()
    }
    spark.stop()
  }
}
