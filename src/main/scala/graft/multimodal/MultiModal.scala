package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline (builder brief):
  * image/audio/video travel as opaque `binary` columns with typed
  * metadata. The Spark-side plumbing — schemas, magic sniffing, batch
  * shape, frame/chunk fan-out — is real and codegen-friendly; the
  * actual media DECODE sits behind a Serializable trait (the containers
  * running this engine don't ship image/audio codecs), with a
  * deterministic fake for tests.
  *
  * Scale posture: sniffing/stats are builtin expressions over the first
  * bytes (no full-blob scan beyond what the scan already read); decode
  * runs in `mapPartitions` with bounded batches so peak memory is
  * `batch * max_asset_size` per task; frame sampling is a per-row
  * `explode(sequence)` — no shuffle anywhere.
  */

/** One media asset row: the opaque payload + typed metadata. */
case class MediaAsset(
    asset_id: Long,
    kind: String,          // "image" | "audio" | "video" | "unknown"
    payload: Array[Byte],
    duration_sec: Double)  // 0 for stills

/** Decoded-image features (what a real decoder would emit). */
case class ImageFeatures(
    asset_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    mean_intensity: Double)

/** Decode boundary — a real deployment plugs libjpeg/ffmpeg etc. here. */
trait ImageDecoder extends Serializable {
  def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) // w, h, c, pixels
}

/** Deterministic fake decoder: dimensions and pixel stats derived from
  * a hash of the payload — stable across executors, no codec deps.
  * The PLUMBING (batching, schema, partition behavior) is identical to
  * what a real decoder would see.
  */
class StubImageDecoder extends ImageDecoder {
  override def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 16 + math.abs(h % 16)
    val ht = 16 + math.abs((h / 16) % 16)
    val pixels = Array.tabulate(8) { i =>
      (math.abs(scala.util.hashing.MurmurHash3.productHash((h, i))) %
        256).toFloat / 255f
    }
    (w, ht, 3, pixels)
  }
}

object MultiModal {

  /** Magic-byte format sniff over the payload prefix — pure builtin
    * expressions (runs inside whole-stage codegen on the scan).
    */
  def sniffFormat(payload: Column): Column = {
    val p = hex(substring(payload, 1, 12))
    when(p.startsWith("89504E470D0A1A0A"), lit("png"))
      .when(p.startsWith("FFD8FF"), lit("jpeg"))
      .when(p.startsWith("47494638"), lit("gif"))
      .when(p.startsWith("52494646") && substring(p, 17, 8) === "57415645", lit("wav"))
      .when(p.startsWith("494433"), lit("mp3"))
      .when(substring(p, 9, 8) === "66747970", lit("mp4"))
      .otherwise(lit("unknown"))
  }

  /** Payload stats: size + content hash (exact-dedup key for media). */
  def payloadStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)))
      .withColumn("content_hash", sha2(col(payloadCol), 256))
      .withColumn("format", sniffFormat(col(payloadCol)))

  /** Decode image assets through the external decoder in bounded
    * batches (the mapInPandas-batch shape, Scala-side).
    */
  def decodeImages(
      assets: Dataset[MediaAsset],
      decoder: ImageDecoder,
      batchSize: Int = 32): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { a =>
          val (w, h, c, pixels) = decoder.decode(a.payload)
          val mean = if (pixels.isEmpty) 0.0 else pixels.map(_.toDouble).sum / pixels.length
          ImageFeatures(a.asset_id, w, h, c, mean)
        }
      }
    }
  }

  /** Video frame sampling: one row per sampled frame timestamp —
    * per-row `explode(sequence)`, no shuffle (the decode of each frame
    * would ride behind [[ImageDecoder]] on the exploded grain).
    */
  def sampleFrames(
      assets: DataFrame,
      everySec: Double,
      durationCol: String = "duration_sec",
      idCol: String = "asset_id"): DataFrame = {
    require(everySec > 0, s"everySec must be positive, got $everySec")
    // ceil(duration / everySec) in double — truncating the interval to a
    // long would divide by zero for sub-second intervals and over-count
    // frames for fractional ones.
    val n = ceil(col(durationCol) / everySec).cast("long")
    assets
      .where(col(durationCol) > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), greatest(n - 1, lit(0L)))).as("frame_idx"))
      .withColumn("frame_ts", col("frame_idx") * everySec)
  }
}
