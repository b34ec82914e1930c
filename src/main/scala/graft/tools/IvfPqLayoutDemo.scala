package graft.tools

import graft.core.{Sessions, Tables}
import graft.ops.{ProductQuantize, Similarity, ZOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-level IVFPQ storage-layout demo — ties the ANN stack to the
  * layout stack: the PQ code store is written z-ordered on
  * (coarse list, first PQ byte), so an IVF probe's file footprint is
  * `nprobe/nlist` of the data instead of all of it, and a further
  * ADC-byte refinement keeps skipping inside each probed list. The
  * comparison layout is the hash-scattered store every naive writer
  * produces (each file spans all lists — nothing skips).
  *
  * The measurement is file-level (min, max) boxes per column — exactly
  * the metadata format-level skipping consumes (same method as
  * RangeLayoutSpec's 2D-box test). At 100 TB the same write shape
  * (range partition on the morton key + sort within files) is how a
  * petabyte PQ store keeps probe I/O proportional to nprobe.
  *
  * Usage: IvfPqLayoutDemo <sfDir> [outDir]
  */
object IvfPqLayoutDemo {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = if (args.length > 1) args(1) else "/tmp/graft-ivfpq-layout"
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, dir)
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    val nlist = 32
    val m = 8
    val ksub = 16
    val numFiles = 32

    val cents = Similarity.pickCentroids(emb, nlist, "embedding", "vec_id")
    // Dense 0-based list index: morton dims must be small-range ints
    // (centroid ids are arbitrary vec ids).
    val listRank = cents.select(col("centroid_id"),
      (row_number().over(Window.orderBy(col("centroid_id"))) - 1).as("list_idx"))
    val assigned = Similarity.ivfAssign(emb, nlist, "embedding", "vec_id", Some(cents))
    val books = ProductQuantize.trainCodebooks(emb, m, ksub, dim, 2, "embedding", "vec_id")
    val rel = ProductQuantize
      .codesArray(ProductQuantize.encode(emb, books, m, dim, "embedding", "vec_id"))
      .join(assigned.withColumnRenamed("vec_id", "id"), "id")
      .join(broadcast(listRank), "centroid_id")
      .select(col("id"), col("codes"), col("list_idx"),
        col("codes").getItem(0).as("code0"))

    ZOrder.zorderLayout(rel, ZOrder.mortonKey(col("list_idx"), col("code0"), bits = 8),
        numFiles)
      .write.mode("overwrite").parquet(s"$out/ivfz")
    // The natural 2-LEVEL layout: primary order the coarse list,
    // secondary the ADC byte — every file spans a contiguous
    // (list, code0) range, so a probe's footprint is nprobe/nlist of
    // the files by construction. Z-order trades that for symmetric
    // 2D skipping, which probe-first access never needs — and under
    // skewed list sizes the row-count-balanced range boundaries cut
    // z-tiles into wide-box files (measured: see COVERAGE).
    rel.repartitionByRange(numFiles, col("list_idx"), col("code0"))
      .sortWithinPartitions(col("list_idx"), col("code0"))
      .write.mode("overwrite").parquet(s"$out/hier")
    rel.repartition(numFiles, col("id"))
      .write.mode("overwrite").parquet(s"$out/scatter")

    def boxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("list_idx")).as("l0"), max(col("list_idx")).as("l1"),
          min(col("code0")).as("c0"), max(col("code0")).as("c1"))
        .select(col("l0").cast("long"), col("l1").cast("long"),
          col("c0").cast("long"), col("c1").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // One query's nprobe=4 probed lists + an ADC-byte refinement.
    val probed = Seq(3L, 9L, 17L, 25L)
    for ((name, path) <- Seq("hier" -> s"$out/hier", "ivf-z" -> s"$out/ivfz",
        "scatter" -> s"$out/scatter")) {
      val b = boxes(path)
      val probeTouch = b.count { case (l0, l1, _, _) =>
        probed.exists(p => l0 <= p && p <= l1) }
      val refineTouch = b.count { case (l0, l1, c0, _) =>
        probed.exists(p => l0 <= p && p <= l1) && c0 <= 3L }
      println(s"[ivfpq-layout] $name: files=${b.length} " +
        s"probe(nprobe=4/$nlist lists) touches=$probeTouch " +
        s"refine(+code0<=3) touches=$refineTouch")
    }
    spark.stop()
  }
}
