package graft

import graft.multimodal._
import org.apache.spark.sql.functions._

class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
  private val wav = "RIFF1234WAVE".getBytes("ASCII")
  private val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftypmp42".getBytes("ASCII")

  private def assets = Seq(
    MediaAsset(1L, "image", png ++ "imagedata".getBytes, 0.0),
    MediaAsset(2L, "image", jpeg ++ "other".getBytes, 0.0),
    MediaAsset(3L, "audio", wav, 125.0),
    MediaAsset(4L, "video", mp4, 30.0),
    MediaAsset(5L, "unknown", "plain text".getBytes, 0.0))

  test("sniffFormat recognizes magic prefixes via builtin expressions") {
    val out = assets.toDS().toDF()
      .select(col("asset_id"), MultiModal.sniffFormat(col("payload")).as("f"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "png", 2L -> "jpeg", 3L -> "wav", 4L -> "mp4", 5L -> "unknown"))
  }

  test("payloadStats: size, content hash, format in one pass") {
    val out = MultiModal.payloadStats(assets.toDS().toDF())
    val r = out.where(col("asset_id") === 1).head()
    assert(r.getAs[Int]("n_bytes") == png.length + 9)
    assert(r.getAs[String]("content_hash").length == 64)
    assert(r.getAs[String]("format") == "png")
  }

  test("decodeImages: deterministic stub decode with batch plumbing") {
    val feats = MultiModal.decodeImages(assets.toDS(), new StubImageDecoder, batchSize = 2)
      .collect().map(f => f.asset_id -> f).toMap
    assert(feats.size == 5)
    assert(feats(1L).channels == 3)
    assert(feats(1L).width >= 16 && feats(1L).width < 32)
    // determinism: re-run with different batch size, same features
    val again = MultiModal.decodeImages(assets.toDS(), new StubImageDecoder, batchSize = 3)
      .collect().map(f => f.asset_id -> f).toMap
    assert(feats(2L) == again(2L))
  }

  test("sampleFrames: fractional intervals count correctly, sub-second allowed") {
    val one = Seq(MediaAsset(9L, "video", Array[Byte](1), 10.0)).toDS().toDF()
    // 10s every 2.5s -> ceil(10/2.5) = 4 frames at 0, 2.5, 5, 7.5
    val frames = MultiModal.sampleFrames(one, everySec = 2.5)
      .select("frame_ts").as[Double].collect().sorted.toSeq
    assert(frames == Seq(0.0, 2.5, 5.0, 7.5))
    // sub-second interval must not divide by a truncated zero
    assert(MultiModal.sampleFrames(one, everySec = 0.5).count() == 20)
    intercept[IllegalArgumentException](MultiModal.sampleFrames(one, everySec = 0.0))
  }

  test("sampleFrames: one row per sampled timestamp, stills excluded") {
    val frames = MultiModal.sampleFrames(assets.toDS().toDF(), everySec = 60.0)
      .select("asset_id", "frame_idx", "frame_ts")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    // audio 125s -> ceil(125/60)=3 frames; video 30s -> 1 frame
    assert(frames == Seq((3L, 0L, 0.0), (3L, 1L, 60.0), (3L, 2L, 120.0), (4L, 0L, 0.0)))
  }
}
