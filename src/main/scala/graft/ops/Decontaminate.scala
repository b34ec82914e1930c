package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (§2.11 extensions): flag training
  * documents that share at least one word n-gram with an evaluation
  * set — the standard guard against test-set leakage into training
  * data (GPT-3 App. C / PaLM-style n-gram overlap checks).
  *
  * Scale shape: the EVAL side is benchmark-sized (thousands of docs),
  * so its distinct n-gram set is built once and BROADCAST; the 100 TB
  * training side is only ever exploded map-side and hash-probed — no
  * shuffle of the corpus, no self-join. The n-gram explode is the
  * irreducible probe grain, and [[graft.functions.NgramsExpr]] keeps
  * the n-gram build codegen'd.
  */
object Decontaminate {

  /** Per-training-doc count of DISTINCT eval-shared n-grams (docs with
    * zero overlap included, `n_shared` 0) plus a `contaminated` flag.
    * Output: (idCol, n_shared, contaminated).
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val evalGrams = eval
      .select(explode(TextAnalysis.ngrams(col(textCol), n)).as("__g"))
      .distinct()
    val hits = train
      .select(col(idCol), explode(TextAnalysis.ngrams(col(textCol), n)).as("__g"))
      .join(broadcast(evalGrams), "__g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__g")).as("n_shared"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  /** TOKENIZER-AWARE decontamination: the [[ngramOverlap]] probe run
    * on n-grams of the PRODUCTION TOKENIZER'S integer ids instead of
    * words — the convention the published eval-leak checks actually
    * use (GPT-3 Appendix C and its successors define overlap on token
    * n-grams of the training tokenizer, not on whitespace words).
    * Token n-grams see contamination word n-grams structurally CAN'T:
    * a rare word shared between a train doc and an eval doc in
    * otherwise different contexts never forms a shared word n-gram
    * (n >= 2), but its subword ids form shared id n-grams; and id
    * n-grams cross word boundaries inside the id stream, so partial
    * phrase overlap straddling a word boundary also fires.
    *
    * `merges`/`vocab` are the trained byte-level tokenizer
    * ([[Bpe.trainByteLevel]] / [[Bpe.vocabTableByteLevel]] — the q178
    * path); both relations are vocabulary-sized. Scale shape is
    * [[ngramOverlap]]'s exactly: the eval side is benchmark-sized, its
    * distinct id-n-gram set broadcasts, and the corpus side is
    * dictionary-grain tokenize + map-only explode + hash probe — no
    * corpus shuffle. The n-gram KEY is the ids packed into one long
    * in base vocabSize (= 256 + merges) — EXACT (injective) while
    * vocabSize^n < 2^62, so no hash trade and an arithmetic replay in
    * the oracle; a vocabulary/n combination past the bound (e.g. the
    * 13-grams GPT-3 used on a 50k vocabulary) falls back to the
    * space-joined id STRING key, equally exact, ~3× the probe bytes
    * (the same two-spelling discipline as the n-gram stats family).
    * Output: (idCol, n_shared, contaminated).
    */
  def tokenIdNgramOverlap(
      train: DataFrame, eval: DataFrame, textCol: String, idCol: String,
      merges: Seq[Bpe.Merge], vocab: DataFrame, n: Int): DataFrame =
    tokenIdNgramOverlapFromIds(
      Bpe.tokenizeToIdsByteLevel(train, textCol, idCol, merges, vocab),
      Bpe.tokenizeToIdsByteLevel(eval, textCol, idCol, merges, vocab),
      idCol, vocabSize = 256L + merges.length, n = n)

  /** [[tokenIdNgramOverlap]] over PRE-TOKENIZED relations — the
    * standing-store spelling ([[TokenStore]]): both sides arrive as
    * (idCol, token_ids array<bigint>), so the tokenizer train +
    * dictionary fold is paid once per corpus version instead of once
    * per consumer. Identical probe semantics and identical packed-key
    * arithmetic (`vocabSize` must be the trained base, 256 + merges,
    * or the injective packing silently changes key space).
    */
  def tokenIdNgramOverlapFromIds(
      trainIds: DataFrame, evalIds: DataFrame, idCol: String,
      vocabSize: Long, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    // Key tiers, all EXACT (injective maps preserve join hits and
    // distinct counts, so the output is identical whichever tier
    // fires; the tier is a function of (n, vocabSize), never of data):
    //  1. one packed long   — vocabSize^n < 2^62 (q180's n=4);
    //  2. TWO packed longs  — each half fits 62 bits (q189's n=13 at
    //     vocabSize 276: 13·log2(276) ≈ 105 bits > 62, but 7+6 split
    //     fits). Round-14: this replaces the string fallback for the
    //     published-n case — a space-joined 13-id string is ~50 bytes
    //     built from 13 casts per gram, over tens of millions of
    //     grams; the struct key is 16 bytes of pure long arithmetic
    //     (guide §2.3 narrower keys).
    //  3. space-joined id string — the unbounded-n fallback.
    val packable = n * math.log(vocabSize.toDouble) < 62 * math.log(2.0)
    val halfA = (n + 1) / 2
    val packable2 = halfA * math.log(vocabSize.toDouble) < 62 * math.log(2.0)
    def idGrams(ids: Column): Column = {
      def packedRange(i: Column, from: Int, until: Int): Column =
        (from until until).foldLeft(lit(0L).cast("long")) { (acc, j) =>
          acc * vocabSize + element_at(ids, (i + j + 1).cast("int")).cast("long")
        }
      def joined(i: Column): Column = array_join(
        transform(slice(ids, i + 1, lit(n)), t => t.cast("string")), " ")
      if (packable)
        when(size(ids) >= n,
          transform(sequence(lit(0), size(ids) - n), i => packedRange(i, 0, n)))
          .otherwise(array().cast("array<long>"))
      else if (packable2)
        when(size(ids) >= n,
          transform(sequence(lit(0), size(ids) - n), i =>
            struct(packedRange(i, 0, halfA).as("g1"),
              packedRange(i, halfA, n).as("g2"))))
          .otherwise(array().cast("array<struct<g1:bigint,g2:bigint>>"))
      else
        when(size(ids) >= n,
          transform(sequence(lit(0), size(ids) - n), i => joined(i)))
          .otherwise(array().cast("array<string>"))
    }
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol), explode(idGrams(col("token_ids"))).as("__g"))
    val evalGrams = grams(evalIds).select(col("__g")).distinct()
    val hits = grams(trainIds)
      .join(broadcast(evalGrams), "__g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__g")).as("n_shared"))
    trainIds.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }
}
