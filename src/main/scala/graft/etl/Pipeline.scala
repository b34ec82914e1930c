package graft.etl

import graft.external.{ChunkCleaner, Embedder, HashEmbedder, StubChunkCleaner}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end pipeline entry point: extract -> transform -> load over a
  * raw-document directory, mirroring the reference's chained CLI stages
  * (cli.py:53-64, `1>4>5`: fetch raw data, clean, build vector store)
  * as ONE lazy Spark plan per stage boundary. The LLM-boundary steps
  * (chunk cleaning, embedding) are injected traits, defaulting to the
  * deterministic stubs; a production caller swaps in real clients
  * without touching the plan shape.
  *
  * Resumable like the reference: if a store already exists at the
  * destination, only chunks NOT already present (composite-key
  * anti-join, J5) are embedded and appended — re-running after a crash
  * never duplicates rows and never re-pays embedding for stored chunks.
  */
object Pipeline {

  /** Run the chain; returns the store DataFrame after writing.
    * Stage boundaries stay DataFrames — nothing is collected.
    */
  def run(
      spark: SparkSession,
      rawDir: String,
      outRoot: String,
      cleaner: ChunkCleaner = new StubChunkCleaner(),
      embedder: Embedder = new HashEmbedder()): DataFrame = {
    val storePath = s"$outRoot/store"
    // Extract: recursive schema'd JSON scan (S3).
    val raw = Extract.readRawDocs(spark, rawDir)
    // Transform: per-chunk clean with all-or-nothing abort (G4), then
    // the cleaned mirror sink (S9). Persisted: the mirror write and the
    // Load stage both consume it, and the cleaner is the expensive
    // per-chunk LLM boundary — without the persist each consumer
    // re-runs the full cleaning pass. (On resume the clean DOES re-run
    // over all raw docs — chunk-level work discovery needs every doc's
    // chunks; only the embedding boundary is skip-listed, like the
    // reference, whose clean stage is similarly re-run per invocation.)
    val cleaned = Transform.cleanVideos(raw, cleaner)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Transform.writeCleanedMirror(cleaned.toDF(), s"$outRoot/cleaned")
      // Load: chunk-grain explode (G3), resume anti-join (J5), grouped
      // embedding (G5), batched store sink (S10).
      val chunks = Load.explodeChunks(cleaned)
      import chunks.sparkSession.implicits._
      if (graft.core.FsUtil.exists(spark, storePath)) {
        // Resume: embed only the chunks the store lacks, append them
        // (the reference re-run skips stored ids, build_vector_store.py).
        val fresh = Load.discoverNewChunks(chunks.toDF(), spark.read.parquet(storePath))
        Load.embedChunks(fresh.as[ChunkDoc], embedder)
          .toDF().write.mode("append").parquet(storePath)
      } else {
        Load.writeStore(Load.embedChunks(chunks, embedder).toDF(), storePath)
      }
    } finally cleaned.unpersist(blocking = false)
    spark.read.parquet(storePath)
  }

  /** CLI: Pipeline <rawJsonDir> <outRoot> — runs with the stub
    * cleaner/embedder and prints stage counts.
    */
  def main(args: Array[String]): Unit = {
    val (rawDir, outRoot) = args match {
      case Array(a, b, _*) => (a, b)
      case _ => sys.error("usage: Pipeline <rawJsonDir> <outRoot>")
    }
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val store = run(spark, rawDir, outRoot)
    println(s"[pipeline] store rows: ${store.count()}")
    spark.stop()
  }
}
