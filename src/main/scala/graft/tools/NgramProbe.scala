package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** A/B cost anatomy for the top-n-gram repetition family (q172):
  * times the three pinned-equal spellings of the Gopher top-{2,3,4}
  * stats over the documents table —
  *
  *  - native: ONE MultiNgramStatsExpr pass (interned token ids, exact
  *    packed-long gram keys, no sort) — the production path;
  *  - hashed HOF: per n, xxhash64 gram hashes + array_sort + run-scan
  *    (builtin HOFs, longs);
  *  - string HOF: per n, concat_ws string grams + array_sort +
  *    run-scan (round 10's production path — the regression baseline).
  *
  * Usage: NgramProbe <sfDir> [reps=2]. Work is materialized via a
  * bit_xor(xxhash64(...)) aggregate over every output column so
  * column pruning can't fake a number (the Bench discipline).
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    import graft.ops.QualityFilter
    val ns = Seq(2, 3, 4)
    // native binds __v in a first projection, mirroring q172.
    val nativeDf = docs
      .select(col("doc_id"),
        graft.ops.TextAnalysis.multiNgramStats(col("text"), ns).as("__v"))
      .select(col("doc_id") +: ns.zipWithIndex.flatMap { case (n, k) =>
        Seq(element_at(col("__v"), 3 + k * 5).as(s"t$n"),
          element_at(col("__v"), 4 + k * 5).as(s"p$n")) }: _*)
    val hashedDf = docs
      .select(col("doc_id"), QualityFilter.tokenHashes(col("text")).as("__th"))
      .select(col("doc_id") +: ns.flatMap { n =>
        val st = QualityFilter.topNgramStatsHashed(col("__th"), n)
        Seq(st.getField("n_ngrams").as(s"t$n"),
          st.getField("top_ngram_n").as(s"p$n")) }: _*)
    val stringDf = docs
      .select(col("doc_id") +: ns.flatMap { n =>
        val st = QualityFilter.topNgramStatsStrings(col("text"), n)
        Seq(st.getField("n_ngrams").as(s"t$n"),
          st.getField("top_ngram_n").as(s"p$n")) }: _*)

    def run(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val h = df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).head().getLong(0)
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[ngram] $name rep$r $s%.2f s (hash $h%016x)")
      }
    }
    run("native", nativeDf)
    run("hashed_hof", hashedDf)
    run("string_hof", stringDf)
    spark.stop()
  }
}
