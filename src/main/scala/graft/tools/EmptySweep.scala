package graft.tools

/** Full-suite empty-input sweep: runs EVERY SparkEntry query against a
  * dataset directory whose tables carry the sf0.001 schemas but ZERO
  * rows, and (second pass) against single-row tables. Invariant: no
  * query may throw — a pipeline that crashes on an empty partition,
  * an empty corpus batch, or a one-document shard is not deployable;
  * at 100 TB some input slice is ALWAYS empty (a new date partition,
  * a filtered-out source, a first incremental batch).
  *
  * Catches the driver-side traps the oracle gate can't see at sf0.01:
  * `.head()`/`.first()` on an empty frame, `collect()(0)`, max/min
  * null unboxing, centroid sampling from an empty corpus, index
  * builds over zero vectors.
  *
  * Usage: EmptySweep [srcDir] [empty|single|both]
  */
object EmptySweep {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val mode = if (args.length > 1) args(1) else "both"
    // A typo'd mode must fail loudly, not run zero sweeps and exit 0.
    require(Set("empty", "single", "both")(mode),
      s"unknown mode '$mode' (expected empty|single|both)")
    val spark = graft.core.Sessions.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")

    def mkDir(label: String, rows: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-$label-sweep").toString
      for (t <- tables) {
        val df = spark.read.parquet(s"$src/$t.parquet")
        df.limit(rows).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      dir
    }

    def sweep(label: String, dir: String): Int =
      Sweep.overQueries(s"$label sweep") { (name, fn) =>
        Right(s"OK   [$label] $name (${fn(spark, dir).collect().length} rows)")
      }

    var total = 0
    if (mode == "empty" || mode == "both")
      total += sweep("empty", mkDir("empty", 0))
    if (mode == "single" || mode == "both")
      total += sweep("single", mkDir("single", 1))
    spark.stop()
    if (total > 0) sys.exit(1)
  }
}
