package graft.tools

import org.apache.spark.sql.functions._

/** Scan-CPU probe for multi-pattern substring search:
  * `MultiMatchProbe <sfDir> [nPatterns...]` times, per lexicon size,
  * the one-pass Aho-Corasick expression (`multi_match`) against the
  * naive per-pattern re-scan (`filter(array(...), p -> contains(text,
  * p))` — the spelling the DuckDB oracle runs) over the documents
  * table, verifying byte-identical results via a bit_xor(xxhash64)
  * digest. The lexicon is deterministic 2-word phrases crossed from
  * the corpus vocabulary, so a fixed fraction genuinely matches.
  */
object MultiMatchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sizes =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(10, 100, 500)
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
      .select(coalesce(col("text"), lit("")).as("text"))

    val vocab = Seq("scan", "column", "window", "order", "sort", "part",
      "agg", "value", "line", "key", "join", "merge", "query", "group",
      "vector", "hash", "slow", "stream", "filter", "fast", "spark",
      "batch", "table", "small", "data", "big", "customer", "row")
    val allPhrases = (for (a <- vocab; b <- vocab) yield s"$a $b") ++
      (for (a <- vocab; b <- vocab; c <- vocab.take(8)) yield s"$a $b $c")

    for (n <- sizes) {
      val lex = allPhrases.take(n)
      def digest(m: org.apache.spark.sql.Column): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val r = docs
          .select(array_join(m, "|").as("j"), size(m).cast("long").as("c"))
          .agg(bit_xor(xxhash64(col("j"))).as("h"), sum(col("c")).as("s"))
          .head()
        (r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9)
      }
      val (ha, sa, ta) = digest(
        graft.ops.Blocklist.phraseMatches(col("text"), lex))
      val (hn, sn, tn) = digest(
        filter(lit(lex.toArray), p => col("text").contains(p)))
      require(ha == hn && sa == sn,
        s"MISMATCH n=$n ac=($ha,$sa) naive=($hn,$sn)")
      println(f"n=$n%4d matches=$sa%8d ac=$ta%6.1f s naive=$tn%6.1f s " +
        f"speedup=${tn / ta}%5.1fx")
    }
    spark.stop()
  }
}
