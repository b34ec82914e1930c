package graft.core

import org.apache.spark.sql.SparkSession

/** Filesystem probes through the Hadoop FileSystem API so
  * existence-guarded operators (snapshot, skip state, incremental
  * sinks) work on HDFS/S3/anything the session can read — a
  * driver-local `java.io.File` check silently reports "absent" for
  * every non-local URI and breaks the idempotency those operators
  * promise.
  */
object FsUtil {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
