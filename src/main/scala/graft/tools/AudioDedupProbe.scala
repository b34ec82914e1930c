package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Cost-anatomy probe for q146_audio_fingerprint_dedup: times the
  * banded arm (full corpus), the sub-corpus fingerprints, and the
  * brute all-pairs arm separately. Usage: AudioDedupProbe <sfDir> [reps]
  */
object AudioDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (rep <- 1 to reps) {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[audio] rep$rep $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val cap = 2000L
      val docs = graft.core.Tables.documents(spark, dir)
      val base = docs.select(col("doc_id"), col("text"), col("n_chars"))
      val clones = base.where(col("doc_id") < 50)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
          col("n_chars"))
      val assetsDf = base.unionByName(clones)
        .select(col("doc_id").as("asset_id"), lit("audio").as("kind"),
          col("text").cast("binary").as("payload"),
          (lit(6.0) + least(col("n_chars"), lit(700)).cast("double") / 50.0)
            .as("duration_sec"))
      val assets = assetsDf.as[graft.multimodal.MediaAsset]
      val dec = new graft.multimodal.HashPcmDecoder
      val allFps = t("full_fingerprints")(
        graft.multimodal.MultiModal.audioFingerprints(
          assets, dec, sampleRate = 512, frameLen = 512, hop = 1280).count())
      val bandedAll = graft.multimodal.MultiModal.audioNearDuplicates(
        assets, dec, maxHamming = 3, minSharedWindows = 2,
        sampleRate = 512, frameLen = 512, hop = 1280)
      t("banded_arm")(bandedAll.count())
      val inS = (c: Column) => c < cap || (c >= 10000000L && c < 10000000L + cap)
      val subFps = graft.core.Caches.persistTracked(
        graft.multimodal.MultiModal.audioFingerprints(
          assetsDf.where(inS(col("asset_id"))).as[graft.multimodal.MediaAsset],
          dec, sampleRate = 512, frameLen = 512, hop = 1280))
      val nSub = t("sub_fingerprints")(subFps.count())
      println(s"[audio] rep$rep counts full=$allFps sub=$nSub")
      val fa = subFps.select(col("asset_id").as("va"), col("window_idx").as("wa"),
        col("fp").as("ha"))
      val fb = subFps.select(col("asset_id").as("vb"), col("window_idx").as("wb"),
        col("fp").as("hb"))
      val brute = fa.join(fb,
          bit_count(bitwise_not(col("ha").bitwiseXOR(col("hb")))) >= lit(61) &&
            (col("va") * 1000000L + col("wa")) < (col("vb") * 1000000L + col("wb")) &&
            col("va") =!= col("vb"))
        .select(least(col("va"), col("vb")).as("audio_a"),
          greatest(col("va"), col("vb")).as("audio_b"))
        .groupBy(col("audio_a"), col("audio_b"))
        .agg(count(lit(1)).as("n_window_pairs"))
        .where(col("n_window_pairs") >= 2)
      t("brute_arm")(brute.count())
      graft.core.Caches.releaseAll()
    }
    spark.stop()
  }
}
