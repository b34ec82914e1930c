package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared run-every-query harness for the suite-wide invariant sweeps
  * (RespellSweep / EmptySweep / NullSweep / PlanLint): iterate
  * `SparkEntry.queries` in name order, apply the sweep's per-query
  * check, release all caches after each query, print one line per
  * query and the N/M summary, and report the failure count — so the
  * release discipline, error rendering, and exit contract live ONCE.
  */
private[tools] object Sweep {

  def errLine(name: String, e: Throwable): String =
    s"ERR  $name: " + Option(e.getMessage).getOrElse(e.getClass.getName)
      .replace('\n', ' ').take(250)

  /** Run `body` for every query; Right = pass (line printed as-is),
    * Left = failure (printed, counted). Exceptions become Left via
    * [[errLine]]. Returns the failure count; caller decides exit.
    */
  def overQueries(
      label: String,
      only: Set[String] = Set.empty,
      summaryWord: String = "clean")(
      body: (String, (SparkSession, String) => DataFrame) => Either[String, String])
      : Int = {
    var bad = 0
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    for ((name, fn) <- qs) {
      val outcome =
        try body(name, fn)
        catch { case e: Throwable => Left(errLine(name, e)) }
      graft.core.Caches.releaseAll(); graft.core.Caches.releaseShared()
      outcome match {
        case Right(line) => println(line)
        case Left(line) => bad += 1; println(line)
      }
    }
    println(s"$label: ${qs.size - bad}/${qs.size} $summaryWord")
    bad
  }
}
