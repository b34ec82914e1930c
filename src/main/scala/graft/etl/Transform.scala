package graft.etl

import graft.external.ChunkCleaner
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Transform stage (SURVEY.md §3.2; reference clean_locally.py +
  * transformers/utils/cleaning.py): per-chunk LLM cleaning with
  * PER-VIDEO ALL-OR-NOTHING abort (G4), plus the A6 integrity check.
  *
  * Scale posture: cleaning is a typed `map` on the video grain — the
  * document is already one row, so "group per video" costs nothing and
  * a chunk failure aborts exactly its own video (reference
  * cleaning.py:86-97 aborts the video, not the run). No shuffle; the
  * external-model calls ride inside the task.
  */
object Transform {

  /** G4: clean every chunk of every video through the (external)
    * cleaner; any chunk failure drops the WHOLE video from the output
    * (it shows up in the A6 integrity check / quarantine instead).
    */
  def cleanVideos(docs: Dataset[VideoDoc], cleaner: ChunkCleaner): Dataset[VideoDoc] = {
    import docs.sparkSession.implicits._
    docs.flatMap { doc =>
      try {
        val cleaned = doc.transcript_chunks.map(ch =>
          TranscriptChunk(cleaner.clean(doc.show_name, doc.title, ch.text), ch.start))
        Some(doc.copy(transcript_chunks = cleaned))
      } catch {
        // All-or-nothing: one bad chunk quarantines the video. Task
        // stays alive (no Spark retry storm for a semantic failure).
        case _: Exception => None
      }
    }
  }

  /** A5: G4 with running counters — executor-side LongAccumulators for
    * cleaned/aborted totals (the reference's `total_added`/`total_skipped`
    * driver counters, build_vector_store.py:46-120; accumulators are the
    * distributed equivalent). Counters are populated once an action runs.
    *
    * Standard Spark accumulator caveat: updates happen inside a
    * TRANSFORMATION, so re-evaluation (a second action on the returned
    * Dataset, task retries, speculation) adds again. Read the counters
    * after exactly one action, or persist the output first if running
    * several; for exact once-only counts use [[integrityCheck]]'s
    * aggregation instead.
    */
  def cleanVideosWithStats(
      docs: Dataset[VideoDoc],
      cleaner: ChunkCleaner): (Dataset[VideoDoc], org.apache.spark.util.LongAccumulator, org.apache.spark.util.LongAccumulator) = {
    import docs.sparkSession.implicits._
    val sc = docs.sparkSession.sparkContext
    val cleanedAcc = sc.longAccumulator("videos_cleaned")
    val abortedAcc = sc.longAccumulator("videos_aborted")
    val out = docs.flatMap { doc =>
      try {
        val cleaned = doc.transcript_chunks.map(ch =>
          TranscriptChunk(cleaner.clean(doc.show_name, doc.title, ch.text), ch.start))
        cleanedAcc.add(1)
        Some(doc.copy(transcript_chunks = cleaned))
      } catch {
        case _: Exception => abortedAcc.add(1); None
      }
    }
    (out, cleanedAcc, abortedAcc)
  }

  /** S9: cleaned-document mirror sink — same partitioned layout as the
    * raw sink, different root (transformers/utils/helpers.py:73-89).
    * `mode = "append"` adds newly cleaned videos to an existing mirror
    * (the resume path — the reference writes one file per video, so its
    * resume is inherently append-shaped).
    */
  def writeCleanedMirror(cleaned: DataFrame, root: String, mode: String = "overwrite"): Unit =
    Extract.writePartitioned(cleaned, root, mode = mode)

  /** A6: integrity check — per-video chunk-count equality between raw
    * and cleaned (transformers/utils/helpers.py:59-70). Returns one row
    * per raw video with both counts and an `ok` verdict; aborted videos
    * appear with `n_cleaned` 0 and ok=false.
    */
  def integrityCheck(raw: DataFrame, cleaned: DataFrame, idCol: String = "video_id"): DataFrame = {
    val r = raw.select(col(idCol), size(col("transcript_chunks")).as("n_raw"))
    val c = cleaned.select(col(idCol), size(col("transcript_chunks")).as("n_cleaned"))
    r.join(c, Seq(idCol), "left")
      .withColumn("n_cleaned", coalesce(col("n_cleaned"), lit(0)))
      .withColumn("ok", col("n_raw") === col("n_cleaned"))
  }
}
