package graft.chunk

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One transcript document heading into the chunker (G1 input grain):
  * reference `CompleteVideoRecord` before chunking
  * (extractors/utils/helpers/processing.py:37-53).
  */
case class TranscriptDoc(video_id: String, snippets: Seq[Snippet])

/** One chunk-grain output row (G3's flattened grain,
  * loaders/build_vector_store.py:73-92).
  */
case class ChunkRow(video_id: String, text: String, start: Double)

/** G1 `chunk_transcript_with_overlap` wired into the engine as a typed
  * `flatMap` (SURVEY.md §7.3): per-row, deterministic, no shuffle — the
  * chunker runs inside the task that read the row, so at 100 TB it scales
  * linearly with input splits and never materializes whole-corpus state.
  *
  * Reference: extractors/utils/helpers/transcript.py:92-168.
  */
object ChunkTranscript {

  /** Chunk every document's snippets into overlapping chunks (typed path). */
  def chunkDocs(
      ds: Dataset[TranscriptDoc],
      chunkSize: Int = 1000,
      chunkOverlap: Int = 200): Dataset[ChunkRow] = {
    import ds.sparkSession.implicits._
    ds.flatMap { doc =>
      ChunkSplitter.chunkTranscript(doc.snippets, chunkSize, chunkOverlap)
        .map(c => ChunkRow(doc.video_id, c.text, c.start))
    }
  }

  /** DataFrame-facing form: `df` must carry `video_id: string` and
    * `snippets: array<struct<text:string,start:double,duration:double>>`.
    * Output is chunk grain (G3 explode already applied by the flatMap).
    */
  def chunkDF(df: DataFrame, chunkSize: Int = 1000, chunkOverlap: Int = 200): DataFrame = {
    import df.sparkSession.implicits._
    chunkDocs(
      df.select(col("video_id").cast("string").as("video_id"), col("snippets"))
        .as[TranscriptDoc],
      chunkSize, chunkOverlap).toDF()
  }
}
