package graft.tools

import org.apache.spark.sql.functions._

/** Null-injection sweep: runs EVERY SparkEntry query against a copy of
  * the dataset whose CONTENT columns are nulled on a deterministic
  * slice of rows (ids and join keys stay intact — the realistic shape
  * of corpus dirt: the record exists, the payload didn't survive).
  * Invariant: no query may throw. The oracle gate can never see this
  * hazard class — the driver's testdata is null-free — while a 100 TB
  * corpus is not; typed pipelines (case-class Encoders feeding
  * mapPartitions decoders) and custom expressions are exactly where a
  * stray null turns into an NPE forty minutes into a real run.
  *
  * Nulled (every 7th row by id): documents.{text, lang, source,
  * n_chars}, embeddings.{embedding, label}, events.{event_type,
  * value}. Key columns and the TPC-H business tables keep reference
  * semantics (their NOT NULL contract is the reference's).
  *
  * Usage: NullSweep [srcDir]
  */
object NullSweep {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.core.Sessions.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files
      .createTempDirectory("graft-null-sweep").toString
    def nullify(cond: org.apache.spark.sql.Column)(cols: String*)(
        df: org.apache.spark.sql.DataFrame) =
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, when(cond, lit(null)).otherwise(col(c))))
    nullify(col("doc_id") % 7 === 0)("text", "lang", "source", "n_chars")(
      spark.read.parquet(s"$src/documents.parquet"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    nullify(col("vec_id") % 7 === 0)("embedding", "label")(
      spark.read.parquet(s"$src/embeddings.parquet"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    nullify(col("event_id") % 7 === 0)("event_type", "value")(
      graft.core.Tables.events(spark, src))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val bad = Sweep.overQueries("null sweep") { (name, fn) =>
      Right(s"OK   $name (${fn(spark, dir).collect().length} rows)")
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
