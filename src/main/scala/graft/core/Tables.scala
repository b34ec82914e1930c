package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver test data (TESTDATA.md).
  *
  * At 100 TB these reads are partitioned parquet scans; everything
  * downstream relies on Catalyst pushing filters/projections into the
  * scan, so no caching or driver-side materialization happens here.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  /** The events table ships with parquet TIMESTAMP(NANOS) which Spark
    * only reads as long (spark.sql.legacy.parquet.nanosAsLong=true, set
    * by Verify/Bench/Sessions). Normalize to a microsecond TimestampType
    * column here with integer arithmetic (no double precision loss).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _      => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact row count from parquet FOOTERS — a driver-side metadata read
    * (KBs per file), zero Spark jobs. For statistics consumed during
    * query CONSTRUCTION (e.g. sizing an LSH plane count to the corpus):
    * an eager `df.count()` there launches a full scan job before the
    * real query starts, once per invocation. Works through the Hadoop
    * FileSystem API, so HDFS/S3 paths behave like local ones.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var total = 0L
    var files = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        files += 1
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try total += r.getRecordCount finally r.close()
      }
    }
    // Loud failure over a silent 0: a layout change (no .parquet suffix,
    // a directory holding only _SUCCESS) would otherwise feed 0 into
    // statistics consumers and silently misconfigure them.
    require(files > 0, s"no .parquet files found under $path")
    total
  }
}

/** Session factory with the scale-oriented defaults used by tests and
  * local tools. The driver's Verify/Bench mains build their own session;
  * this one mirrors their config (UTC, AQE, small shuffle partitions
  * for local[32]).
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
