package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE machine-readable JSON line.
  *
  * Work is materialized via `sum(xxhash64(all columns))` — a full-row hash
  * aggregate — so Catalyst cannot column-prune away the projected work the
  * query claims to measure (a bare `.count()` lets the optimizer delete
  * every unreferenced projection and the bench degenerates to scan timing).
  * Failures are reported in an `errors` map, never as timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm the session so the first measured query is not charged JVM /
    // codegen / parquet-footer startup: run a small query through the
    // same shapes the suite uses (scan -> broadcast join -> decimal agg
    // -> xor materialization).
    {
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val w = n.join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_regionkey"))
        .agg(sum(col("n_nationkey").cast("decimal(20,4)")).cast("double").as("s"))
      w.select(xxhash64(w.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
    }

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Optional subset run (comma-separated names) for targeted
    // measurements — e.g. the session-shared discovery trio.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // Full-row materialization: every output column feeds the hash;
        // bit_xor aggregation cannot overflow under ANSI mode.
        df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
          .agg(bit_xor(col("h"))).collect()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      } finally {
        // Operators persist mid-plan relations (banded LSH, IVF
        // centroids); release them so the loop's block-manager footprint
        // stays flat across 60+ queries. SESSION-SHARED relations (the
        // support-pair discovery) deliberately survive — their reuse
        // across consumers is part of what the suite measures.
        graft.core.Caches.releaseAll()
      }
    }
    graft.core.Caches.releaseShared()

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Locale.ROOT: the default-locale f-interpolator renders a comma
    // decimal separator on e.g. de_DE JVMs, breaking the JSON.
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v: java.lang.Double)
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${r3(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"materialization":"bit_xor(xxhash64(*))","sf":${jstr(sfDir)}}"""
    // One bare line on stdout (build.sbt routes forked stdout through
    // un-prefixed so the driver can json-parse it), plus a file copy.
    println(line)
    // The full line above can exceed a log-tail capture that truncates from
    // the front; emit a short self-contained summary LAST so the headline
    // metric always survives and parses.
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_ok":${timings.size},"n_err":${errors.size},"sf":${jstr(sfDir)}}""")
    // BENCH_LOCAL.json is the canonical sf0.1 snapshot the docs cite;
    // a run against any other input must not clobber it. BENCH_LAST.json
    // always holds the most recent run (any SF) for scale-snapshot
    // copying without stdout parsing.
    if (sfDir == "/root/testdata/sf0.1")
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), line)
      catch { case _: Throwable => () }
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
