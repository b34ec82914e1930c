package graft.etl

/** Pipeline data model (SURVEY.md §1.1): the nested video document that
  * flows extract -> transform -> load, and its flattened chunk grain.
  * Case classes double as Spark Encoders and as the enforced read schema
  * (the reference's TypedDicts are mypy-only; here the schema is checked
  * at read time).
  */

/** Reference `TranscriptChunk` (core/types.py:6-8). */
case class TranscriptChunk(text: String, start: Double)

/** Reference `CompleteVideoRecord` (core/types.py:11-12):
  * catalog row ∪ API metadata + chunked transcript.
  */
case class VideoDoc(
    id: Long,
    video_id: String,
    show_name: String,
    hosts: Seq[String],
    title: String,
    description: String,
    published_at: Long,
    duration: Long,
    transcript_chunks: Seq[TranscriptChunk])

/** One transcript-fetch outcome row (S5): `status` is "fetched",
  * "skipped" (permanent — `reason` carries the reference's skip cause,
  * transcript.py:40-89) or "error" (transient — retried next run).
  */
case class TranscriptFetchRow(
    video_id: String,
    status: String,
    reason: Option[String],
    snippets: Seq[graft.chunk.Snippet])

/** Flattened chunk-grain row (reference `EmbeddingCMetadata`,
  * loaders/utils/types.py:18-25): what lands in the vector store.
  */
case class ChunkDoc(
    video_id: String,
    show_name: String,
    hosts: String,
    title: String,
    published_at: Long,
    start_time: Double,
    text: String)

/** ChunkDoc + its embedding (the pgvector row). */
case class EmbeddedChunk(
    video_id: String,
    show_name: String,
    hosts: String,
    title: String,
    published_at: Long,
    start_time: Double,
    text: String,
    embedding: Array[Float])
