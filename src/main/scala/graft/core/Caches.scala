package graft.core

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames persisted inside operators (banded LSH
  * relations, IVF centroid picks). Operators persist mid-plan relations
  * they reference repeatedly, but they return lazy plans and so cannot
  * know when the caller's terminal action has run — in a long-lived
  * session (bench loop, notebook) those caches would otherwise
  * accumulate until the block manager evicts them. Callers bound the
  * lifetime by calling [[releaseAll]] between units of work (the bench
  * harness does so after every query).
  */
object Caches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at MEMORY_AND_DISK and register it for release. */
  def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    live.add(p)
    p
  }

  /** Unpersist every tracked relation (non-blocking) and clear the registry. */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false) catch { case _: Throwable => () }
      d = live.poll()
    }
  }
}
