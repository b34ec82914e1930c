package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY.md §2.9): the reference is
  * batch-incremental (idempotent re-runs + skip state); this module
  * exposes the same pipeline shapes as streams —
  * `readStream -> transforms -> writeStream` with watermarked windowed
  * aggregations and keyed custom state.
  *
  * Scale posture: windowed aggs shuffle once on (window, key) with
  * watermark-bounded state; sessionization state is per-key and evicted
  * on gap timeout; the incremental store sink keeps the reference's J5
  * anti-join idempotency inside `foreachBatch` so replays never
  * duplicate rows.
  */

/** One stream event (mirrors the events test table). */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Running per-user session accumulator. */
case class SessionState(nEvents: Long, totalValue: Double, startMs: Long, lastMs: Long)

/** Emitted session row (update-mode: running totals per session). */
case class SessionUpdate(
    user_id: Long,
    n_events: Long,
    total_value: Double,
    duration_sec: Long,
    closed: Boolean)

object StreamingOps {

  /** File-source stream over a document/event directory with an
    * enforced schema (streaming S3: every new file is one micro-batch
    * increment).
    */
  def fileStream(spark: SparkSession, dir: String, schemaOf: DataFrame): DataFrame =
    spark.readStream.schema(schemaOf.schema).option("maxFilesPerTrigger", 16).json(dir)

  /** §2.9 tumbling windowed counts with a watermark: late events beyond
    * `watermark` are dropped and window state is evicted — bounded state
    * at any scale. Batch-equivalent of q21.
    */
  def windowedCounts(
      events: DataFrame,
      windowDur: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Keyed custom state via flatMapGroupsWithState: per-user sessions
    * closed after `gapSec` of event-time silence. Emits a running update
    * per batch and a final `closed` row when the gap is exceeded.
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val ms = e.ts.getTime
            if (st != null && ms - st.lastMs > gapSec * 1000) {
              out += SessionUpdate(userId, st.nEvents, st.totalValue,
                (st.lastMs - st.startMs) / 1000, closed = true)
              st = null
            }
            st =
              if (st == null) SessionState(1, e.value, ms, ms)
              else SessionState(st.nEvents + 1, st.totalValue + e.value, st.startMs, ms)
          }
          if (st != null) {
            state.update(st)
            out += SessionUpdate(userId, st.nEvents, st.totalValue,
              (st.lastMs - st.startMs) / 1000, closed = false)
          }
          out.iterator
      }
  }

  /** Incremental store sink: each micro-batch anti-joins against what
    * the store already holds on (video_id, start_time) — the reference's
    * J5 resumability (build_vector_store.py:78-80) as a streaming sink,
    * so replayed batches are idempotent.
    */
  def incrementalStoreSink(
      chunks: DataFrame,
      storePath: String,
      checkpoint: String): StreamingQuery =
    chunks.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh =
          if (graft.core.FsUtil.exists(spark, storePath)) {
            val existing = spark.read.parquet(storePath).select("video_id", "start_time")
            batch.join(existing, Seq("video_id", "start_time"), "left_anti")
          } else batch
        fresh.write.mode("append").parquet(storePath)
      }
      .start()
}
