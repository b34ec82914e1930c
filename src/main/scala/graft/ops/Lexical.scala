package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (sparse) retrieval scoring over a document corpus: TF-IDF /
  * BM25 — the keyword-match half of hybrid retrieval (the reference's
  * RAG retrieves by embedding cosine + SQL metadata filters; every
  * production RAG pairs that with a lexical ranker for exact-term
  * recall).
  *
  * Everything is deterministic closed-form math over token counts, so
  * unlike the hash-derived ANN operators this family is fully
  * oracle-checkable (DuckDB reproduces identical scores).
  *
  * Scale shape: one token-grain explode of the corpus (the same grain
  * any inverted-index build pays), two hash aggregations (term
  * frequency per (doc, term), document frequency per term), and a
  * broadcast of the tiny corpus-stats row. Per-query scoring semi-joins
  * the posting lists on the query's terms — the inverted-index probe —
  * so a query touches only its terms' postings, never the corpus.
  */
object Lexical {

  /** Lowercased whitespace tokens (the tokenizer the text-analysis
    * family uses; swap for a real analyzer at the call site).
    */
  def tokens(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")

  /** Per-(doc, term) BM25 score table — the posting-list relation with
    * scores precomputed (what a search index materializes):
    * columns (id, term, tf, df, score).
    *
    * BM25: idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)),
    * score(d, t) = idf * tf * (k1+1) / (tf + k1 * (1 - b + b * |d|/avgdl)).
    *
    * `maxDfFraction` prunes terms present in more than that fraction of
    * the corpus from the index (standard stopword pruning at build
    * time): without it, one stopword in a query drags the probe to
    * full-corpus posting grain — at 100 TB the single query term
    * matching everything IS the scale hazard. Ranking deviation is
    * bounded by the dropped terms' idf, which is near zero at high df
    * (df ~ N gives idf ~ ln(1 + 0.5/N)); document-length normalization
    * of the surviving terms is unchanged.
    */
  def bm25Postings(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      maxDfFraction: Option[Double] = None): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val docLen = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // Corpus stats are one tiny row — broadcast, never a shuffle key.
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val joined = tf.join(dfreq, "term")
      .join(docLen, "id")
      .crossJoin(broadcast(stats))
    // df-cutoff BEFORE scoring: pruned terms never materialize postings,
    // so no probe can touch them (the df filter rides the same joined
    // relation — no extra shuffle).
    val bounded = maxDfFraction.fold(joined)(f =>
      joined.where(col("df") <= lit(f) * col("n_docs")))
    bounded
      .withColumn("score",
        idf * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .select(col("id"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Reciprocal-rank fusion of ranked lists (the standard hybrid-
    * retrieval combiner: dense cosine top-k + sparse BM25 top-k —
    * Cormack et al., public algorithm): each list contributes
    * 1 / (kRrf + rank) per id; ids missing from a list contribute 0.
    * Rank-based, so the lists' incomparable score scales never need
    * calibration. Each input is a (id, rank) relation; the result is
    * (id, rrf_score, n_lists).
    */
  def rrfFuse(
      ranked: Seq[DataFrame],
      idCol: String = "id",
      rankCol: String = "rank",
      kRrf: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "at least one ranked list")
    ranked
      .map(df => df
        // Enforce the contract per list: null ranks drop, and an id
        // appearing more than once contributes only its BEST rank —
        // otherwise a non-deduped list double-counts into the score
        // AND inflates n_lists (which counts source lists, not rows).
        .where(col(rankCol).isNotNull)
        .groupBy(col(idCol).as("id"))
        .agg(min(col(rankCol)).as("__best"))
        .select(col("id"),
          (lit(1.0) / (lit(kRrf.toDouble) + col("__best"))).as("contrib")))
      .reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(sum(col("contrib")).as("rrf_score"), count(lit(1)).as("n_lists"))
  }

  /** Top-k documents for a bag-of-terms query: semi-join the postings
    * on the query terms (inverted-index probe), sum per doc, rank.
    * Duplicate query terms count once (bag -> set), like Lucene's
    * default.
    */
  def bm25TopK(
      postings: DataFrame,
      queryTerms: Seq[String],
      k: Int): DataFrame = {
    // orderBy+limit plans as TakeOrderedAndProject (per-partition
    // bounded heaps, no global sort); a no-partition Window here would
    // instead pull every matched doc into ONE partition to rank it —
    // the single-reducer sort this index exists to avoid. Rank
    // attribution happens after the limit, over only k rows.
    postings
      .where(col("term").isin(queryTerms.distinct: _*))
      .groupBy(col("id"))
      .agg(sum(col("score")).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id"))))
  }

  /** Top-k characteristic terms per document group (per source, per
    * language, per domain — the "what is this slice about" audit a
    * mixture rebalance or a contamination investigation starts with):
    * classic TF-IDF with tf at GROUP grain and document frequency at
    * doc grain, so a term scores high when the slice uses it heavily
    * and the rest of the corpus does not.
    *
    * Exactness: tf and df are integer counts; idf snaps to the 1e-6
    * micro grid as `rint(ln(N/df) * 1e6)` (the q82 precedent — DuckDB's
    * `round_even(ln(...)*1e6)` lands on the same integer), and the
    * score is the exact int64 product tf * idf_micro. No float ordering
    * seam anywhere, so ranks reproduce on any engine.
    *
    * Scale shape: one token-grain explode (the inverted-index grain),
    * two hash aggregations — (group, term) tf and term-grain df from
    * the DISTINCT (doc, term) relation — a broadcast 1-row corpus
    * count, and a per-group top-k. The rank window filters to
    * `rnk <= k` immediately, so InferWindowGroupLimit prunes to k rows
    * per group map-side before the rank shuffle — no group ever sorts
    * its full vocabulary on one reducer.
    */
  def tfidfKeywords(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val toks = graft.core.Caches.persistTracked(
      docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("term")))
    val tfGrp = toks.groupBy(col("grp"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col("id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val idfMicro = rint(log(col("n_docs").cast("double") / col("df")) * lit(1000000.0))
      .cast("long")
    val scored = tfGrp.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_micro", col("tf") * idfMicro)
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score_micro").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("grp"), col("term"), col("tf"), col("df"),
        col("score_micro"), col("rnk"))
  }
}
