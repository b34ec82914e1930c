package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full-suite parquet-respell sweep: runs EVERY SparkEntry query on
  * sf0.001 and on a value-preserving respelled copy (the RespellSpec
  * spellings: INT32 ids, DOUBLE[] embeddings, NTZ timestamps — the
  * shapes the driver has already shipped across rounds) and compares
  * canonicalized results. RespellSpec pins ~20 representative queries
  * per-commit; this tool is the periodic all-139 confirmation.
  *
  * Usage: RespellSweep [srcDir]
  */
object RespellSweep {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.core.Sessions.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-respell-sweep").toString
    spark.read.parquet(s"$src/documents.parquet")
      .withColumn("doc_id", col("doc_id").cast(IntegerType))
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$src/embeddings.parquet")
      .withColumn("vec_id", col("vec_id").cast(IntegerType))
      .withColumn("label", col("label").cast(LongType))
      .withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    graft.core.Tables.events(spark, src)
      .withColumn("event_id", col("event_id").cast(IntegerType))
      .withColumn("user_id", col("user_id").cast(IntegerType))
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$dir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)

    // Canonical value rendering: widths legitimately follow the input
    // spelling, so widen then stringify — equal VALUES render equally.
    def canon(df: DataFrame): Seq[String] = {
      val cols = df.schema.fields.toIndexedSeq.map { f =>
        val c = col(f.name)
        val w = f.dataType match {
          case IntegerType | ShortType | ByteType => c.cast("long")
          case FloatType => c.cast("double")
          case ArrayType(FloatType, _) => c.cast("array<double>")
          case ArrayType(IntegerType, _) => c.cast("array<long>")
          case TimestampNTZType => c.cast("timestamp")
          case _ => c
        }
        w.cast("string").as(f.name)
      }
      df.select(cols: _*).collect()
        .map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) "\u0000" else r.getString(i)).mkString("|"))
        .sorted.toIndexedSeq
    }

    Sweep.overQueries("respell sweep", summaryWord = "invariant") {
      (name, fn) =>
        val a = canon(fn(spark, src))
        graft.core.Caches.releaseAll(); graft.core.Caches.releaseShared()
        val b = canon(fn(spark, dir))
        if (a == b) Right(s"OK   $name (${a.size} rows)")
        else {
          val d = a.zip(b).indexWhere { case (x, y) => x != y }
          Left(s"DIFF $name rows=${a.size}/${b.size} firstDiff=$d\n" +
            s"  src:  ${a.lift(math.max(d, 0)).getOrElse("")}\n" +
            s"  resp: ${b.lift(math.max(d, 0)).getOrElse("")}")
        }
    }
    spark.stop()
  }
}
