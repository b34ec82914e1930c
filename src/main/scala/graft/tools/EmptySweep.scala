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

    def sweep(label: String, dir: String): Int = {
      var bad = 0
      for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
        try {
          val n = fn(spark, dir).collect().length
          graft.core.Caches.releaseAll(); graft.core.Caches.releaseShared()
          println(s"OK   [$label] $name ($n rows)")
        } catch {
          case e: Throwable =>
            bad += 1
            graft.core.Caches.releaseAll(); graft.core.Caches.releaseShared()
            println(s"ERR  [$label] $name: " +
              Option(e.getMessage).getOrElse(e.getClass.getName)
                .replace('\n', ' ').take(200))
        }
      }
      println(s"$label sweep: ${graft.SparkEntry.queries.size - bad}/" +
        s"${graft.SparkEntry.queries.size} clean")
      bad
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
