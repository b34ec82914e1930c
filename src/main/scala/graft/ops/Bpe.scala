package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BYTE-PAIR-ENCODING tokenizer training (§2.11 extensions,
  * augmentation/tokenization family): learn a merge table from the
  * corpus (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units") and tokenize text with it — replacing the
  * whitespace-token suite convention under token-grain ops (shard
  * packing, budget caps, sequence packing) with a trained subword
  * vocabulary, the way a real pretraining pipeline does.
  *
  * Scale shape — the classical BPE decomposition: ONE corpus scan
  * builds the distinct-word histogram (map-side-combinable count; the
  * word vocabulary is orders of magnitude smaller than the corpus),
  * and every merge round runs on that histogram alone: adjacent-pair
  * counts are one map-side-combined aggregation over the word table,
  * the argmax collects exactly ONE row to the driver (bounded by
  * construction, the k-core discipline), and the merge application is
  * map-only. `localCheckpoint` per round truncates the lineage so N
  * rounds cost O(N) work, not O(N²) plan re-execution.
  *
  * Determinism contract (engine-portable, DuckDB-replayable):
  *  - pair count = Σ over distinct words of freq(word) × (adjacent
  *    positions of the pair in the word's symbol sequence) — the
  *    standard overlapping-position count;
  *  - argmax tie-break: highest count, then lexicographically smallest
  *    (a, b) under binary string order (identical in Spark and DuckDB
  *    for the ASCII corpus);
  *  - merge application = `replace(replace(s, " a b ", " ab "),
  *    " a b ", " ab ")` on the space-padded symbol string. One
  *    left-to-right non-overlapping pass can skip an occurrence whose
  *    leading delimiter the previous match consumed, but it can never
  *    skip two in a row, so the second pass reaches a fixpoint — a
  *    well-defined semantics both engines implement with their native
  *    `replace`. (It deviates from strict leftmost-greedy BPE only on
  *    odd runs ≥ 5 of a self-pair, e.g. "aaaaa" with merge (a,a) —
  *    a tie the BPE literature leaves implementation-defined anyway.)
  *
  * Early exhaustion (every word fully merged) stops training; the SQL
  * replay mirrors it for free because a `LIMIT 1` over zero pairs makes
  * that round's merge relation empty and every later round inherits it.
  */
object Bpe {

  /** One learned merge: rank (1-based round), the symbol pair, and the
    * pair's corpus count at merge time.
    */
  final case class Merge(rank: Int, a: String, b: String, count: Long)

  /** A word as its initial symbol sequence: characters joined by single
    * spaces ("the" -> "t h e"). DOTALL `(?s)` because Java's bare `.`
    * excludes the line terminators U+0085/U+2028/U+2029, which are NOT
    * in `\s` and so can appear INSIDE a word — without the flag the
    * distributed path would leave such characters un-split while
    * [[trainLocal]]'s codePoints split and the native tokenizer split
    * every code point, breaking the pinned three-way equivalence on
    * non-ASCII input. DuckDB mirror (RE2's bare dot already excludes
    * only \n): `trim(regexp_replace(w, '(?s)(.)', '\1 ', 'g'))`.
    */
  def charSeq(w: Column): Column = trim(regexp_replace(w, "(?s)(.)", "$1 "))

  // ------------------------------------------------ byte-level option

  /** BYTE-LEVEL convention (the GPT-2 family's): pretokenize with a
    * category regex that keeps the leading space on a word (so
    * "world" and " world" learn separate merges — the published
    * behavior), then split each pretoken into its UTF-8 BYTES, so the
    * base alphabet is at most 256 symbols and NO input can ever be
    * out-of-vocabulary. Differences from OpenAI's exact tokenizer,
    * both deliberate: (1) the contraction alternatives ('s, 't, ...)
    * and the trailing-whitespace lookahead `\s+(?!\S)` are dropped —
    * RE2 (the DuckDB oracle's engine) has no lookahead, and the
    * convention must replay identically in both engines; a whitespace
    * run therefore tokenizes as its own pretoken. (2) Bytes are
    * spelled as UPPERCASE HEX PAIRS ("48 65 6C ..."), not GPT-2's
    * bytes-to-unicode table — hex pairs survive every engine's string
    * handling verbatim, the merge machinery operates on [0-9A-F]
    * symbols only, and a hex-pair symbol's id in [[vocabTableByteLevel]]
    * IS its byte value (sorted order of the 256 pairs = numeric byte
    * order). No lowercasing — byte-level vocabularies are
    * case-preserving by construction. (3) Whitespace is the EXPLICIT
    * class `[ \t\n\x0B\f\r]` (Java's ASCII `\s`), never the `\s`
    * shorthand: Java's `\s` includes U+000B (VT) while RE2's does
    * not, so the shorthand would pretokenize a VT-bearing text
    * differently in Spark than in the DuckDB replay — spelling the
    * class out once fixes both engines (the string is interpolated
    * into both).
    */
  val byteLevelPattern: String =
    " ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+"

  /** Byte-level pretokens of a text column (see [[byteLevelPattern]]). */
  def pretokenizeByteLevel(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(byteLevelPattern), lit(0))

  /** A pretoken as its initial BYTE symbol sequence: UTF-8 bytes as
    * space-joined uppercase hex pairs ("He" -> "48 65"). DuckDB
    * mirror: `trim(regexp_replace(hex(encode(w)), '(..)', '\1 ', 'g'))`.
    */
  def charSeqBytes(w: Column): Column =
    trim(regexp_replace(hex(encode(w, "UTF-8")), "(..)", "$1 "))

  /** Distinct-pretoken histogram under the byte-level convention. */
  def wordCountsByteLevel(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(pretokenizeByteLevel(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** [[train]] under the byte-level convention — same two pinned-equal
    * paths, same argmax/merge semantics; only the histogram and the
    * initial symbol split differ.
    */
  def trainByteLevel(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      driverCap: Int = 100000): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val hist = wordCountsByteLevel(df, textCol)
    if (driverCap > 0) {
      val sample = hist.limit(driverCap + 1).collect()
      if (sample.length <= driverCap)
        return trainLocalSym(
          sample.map(r => (r.getString(0), r.getLong(1))), numMerges,
          w => w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .map(b => f"${b & 0xff}%02X"))
    }
    trainLoop(
      hist.select(charSeqBytes(col("word")).as("w"), col("freq"))
        .localCheckpoint(),
      numMerges)
  }

  /** Two-pass `replace` of " a b " with " ab " on an already-padded
    * symbol string — the fixpoint merge application (see object doc).
    */
  private def mergeOnce(s: Column, a: String, b: String): Column = {
    val pat = lit(s" $a $b ")
    val rep = lit(s" $a$b ")
    replace(replace(s, pat, rep), pat, rep)
  }

  /** Distinct-word histogram of the suite tokenization (lowercased,
    * whitespace-split, empties dropped): (word, freq). The
    * `lower(trim(...))` here is the shared CASING CONVENTION for every
    * tokenizer trained from this histogram — inference paths
    * ([[WordPiece.tokenizeToIds]], [[Bpe.tokenizeToIds]]) apply the
    * identical lowercasing, and must keep doing so, or a cased corpus
    * would silently tokenize [UNK]-heavy against a lowercase vocab.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(
        split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
        t => t =!= lit(""))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Train `numMerges` BPE merges over the corpus.
    *
    * Two paths, pinned equal (TrainSpec):
    *  - histogram ≤ `driverCap` distinct words (checked with a
    *    `limit(cap+1)` collect — bounded by construction, the
    *    [[KCore]] finisher discipline): the merge loop runs on the
    *    driver over the collected histogram, identical semantics, ONE
    *    Spark job total instead of two per round. Real vocabularies
    *    are well under the default cap; the corpus scan still happens
    *    exactly once.
    *  - larger histograms: the distributed loop — per-round map-side
    *    pair counts + a ONE-row argmax collect, `localCheckpoint` per
    *    round so N rounds cost O(N).
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      driverCap: Int = 100000): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val hist = wordCounts(df, textCol)
    if (driverCap > 0) {
      val sample = hist.limit(driverCap + 1).collect()
      if (sample.length <= driverCap)
        return trainLocal(
          sample.map(r => (r.getString(0), r.getLong(1))), numMerges)
    }
    trainLoop(
      hist.select(charSeq(col("word")).as("w"), col("freq"))
        .localCheckpoint(),
      numMerges)
  }

  /** The distributed merge loop over a (w: space-joined symbols, freq)
    * relation — convention-independent (both the code-point and the
    * byte-level paths feed it).
    */
  private def trainLoop(words0: DataFrame, numMerges: Int): Seq[Merge] = {
    var words = words0
    val out = ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val best = words
        .select(split(col("w"), " ").as("sym"), col("freq"))
        .where(size(col("sym")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(0), size(col("sym")) - 2), i =>
            struct(element_at(col("sym"), i + 1).as("a"),
              element_at(col("sym"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        out += Merge(r, a, b, c)
        words = words
          .select(trim(mergeOnce(
            concat(lit(" "), col("w"), lit(" ")), a, b)).as("w"), col("freq"))
          .localCheckpoint()
        r += 1
      }
    }
    out.toSeq
  }

  /** The driver-local merge loop — semantics IDENTICAL to the
    * distributed one: freq-weighted overlapping adjacent-position pair
    * counts, (count DESC, a, b) argmax under UTF-8 BYTE order (Spark's
    * string comparison; Java's UTF-16 compareTo would diverge on
    * supplementary characters), and the two-pass padded replace
    * (Java's `String.replace` is the same left-to-right
    * non-overlapping scan as Spark's and DuckDB's).
    */
  /** UTF-8 byte comparison — Spark's string order (Java's UTF-16
    * compareTo diverges on supplementary characters). Used by the
    * driver-local argmax tie-break and the vocabulary id sort.
    */
  private[ops] def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  private def trainLocal(
      hist: Array[(String, Long)], numMerges: Int): Seq[Merge] =
    // Code-POINT split, matching Spark's regexp_replace "(?s)(.)" (Java
    // regex `.` under DOTALL consumes a full surrogate pair, any
    // character) and RE2's UTF-8 dot under (?s).
    trainLocalSym(hist, numMerges,
      w => w.codePoints().toArray.map(cp => new String(Character.toChars(cp))))

  /** Driver-local merge loop over any initial symbol split. */
  private def trainLocalSym(
      hist: Array[(String, Long)], numMerges: Int,
      symbols: String => Array[String]): Seq[Merge] = {
    var words = hist.map { case (w, f) => (symbols(w).mkString(" "), f) }
    val out = ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, f) <- words if w.nonEmpty) {
        val sym = w.split(" ")
        var i = 0
        while (i < sym.length - 1) {
          val k = (sym(i), sym(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        for (e <- counts) {
          if (best == null || e._2 > best._2 ||
            (e._2 == best._2 && (utf8Lt(e._1._1, best._1._1) ||
              (e._1._1 == best._1._1 && utf8Lt(e._1._2, best._1._2)))))
            best = e
        }
        val ((a, b), c) = best
        out += Merge(r, a, b, c)
        val pat = s" $a $b "
        val rep = s" $a$b "
        words = words.map { case (w, f) =>
          (s" $w ".replace(pat, rep).replace(pat, rep).trim, f)
        }
        r += 1
      }
    }
    out.toSeq
  }

  /** BPE-tokenize a text column with a trained merge table: suite word
    * split, then per word the full merge sequence applied in rank order
    * (exactly the training composition, so a word tokenizes to the same
    * symbols the final training word table holds). Returns
    * `array<string>` of subword tokens in document order.
    *
    * Map-only, via [[graft.functions.BpeTokenizeExpr]] — a native
    * one-pass expression with a per-vocabulary WORD cache, so each
    * distinct word pays the merge fold once per JVM instead of once
    * per occurrence (117 s → scan-bound at sf10m's 27M occurrences /
    * 3.1k words). No shuffle, no dictionary join; [[tokenizeFold]] is
    * the pure-Column reference spelling, pinned equal in TrainSpec.
    */
  def tokenize(text: Column, merges: Seq[Merge]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BpeTokenizeExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(
          coalesce(text, lit(""))),
        merges.sortBy(_.rank).map(m => (m.a, m.b))))

  /** [[tokenize]] under the byte-level convention — native one-pass
    * expression with the same per-vocabulary word cache; emits hex-
    * pair-composed subword symbols. Every emission is a composition
    * of the 256 byte symbols, so with [[vocabTableByteLevel]] no
    * input — ANY corpus, any script — can produce an unk.
    */
  def tokenizeByteLevel(text: Column, merges: Seq[Merge]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BpeTokenizeExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(
          coalesce(text, lit(""))),
        merges.sortBy(_.rank).map(m => (m.a, m.b)), byteLevel = true))

  /** BROADCAST-DICTIONARY tokenize — the form that survives a 50k-merge
    * vocabulary at 100 TB: the corpus's distinct words are tokenized
    * ONCE each through the pure merge fold (a distributed, cache-free
    * stage whose cost is ∝ |vocabulary| × |merges|, NOT corpus size),
    * and every occurrence resolves by an equi-join on the word (AQE
    * broadcasts the dictionary when it is small — the common case:
    * vocabularies are orders of magnitude below the corpus). Exactly
    * the training composition ([[tokenize]]'s semantics, pinned equal
    * in TrainSpec), and the same join-by-word form the q154 oracle
    * replays in SQL.
    *
    * Versus [[tokenize]] (the native cached expression): the per-JVM
    * word cache is ideal while the vocabulary fits memory and the fold
    * is cheap (tens of merges); with a 50k-merge vocabulary each cache
    * MISS pays 50k two-pass replaces, and a high-entropy corpus
    * degrades to per-occurrence cost. The dictionary join pays the
    * fold exactly once per distinct word regardless of JVM count,
    * cache pressure, or merge count — at the price of one token-grain
    * shuffle (the groupBy that reassembles documents).
    *
    * Returns (idCol, tokens array<string>) — one row per input row;
    * empty/null text yields the empty array, matching [[tokenize]].
    * idCol must be unique (a doc id).
    */
  def tokenizeByDict(
      df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val (words, dict) = wordsAndDict(df, textCol, idCol, merges)
    reassemble(df, idCol, words, dict.select(col("__w"), col("__t")),
      "tokens", "array<string>")
  }

  /** The word-occurrence relation (one row per word position) and the
    * persisted per-distinct-word subword dictionary shared by the
    * dictionary-join paths. The dictionary folds each distinct word
    * through the NATIVE expression, not tokenizeFold: the fold
    * spelling nests 2x|merges| replace expressions, which overflows
    * Catalyst analysis beyond a few hundred merges — the exact regime
    * these paths exist for. Persisted AND materialized eagerly: an
    * un-materialized cached relation has UNKNOWN size statistics
    * (defaultSizeInBytes = huge), so the planner's first pass put the
    * dictionary on the STREAMED side and broadcast the word-OCCURRENCE
    * side instead — a 288 MB broadcast of 2.7M occurrences probing 310
    * dict rows at sf1m, locked in before AQE could see the real 31 KiB
    * (broadcast query stages materialize early and never flip build
    * side). The count() pays the vocabulary-sized dict build once —
    * work its first consumer paid anyway — and every consumer then
    * plans the join from true stats: broadcast the dict when it is
    * small, sort-merge when a 100 TB vocabulary is not.
    */
  private def wordsAndDict(
      df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): (DataFrame, DataFrame) = {
    val words = df.select(col(idCol).as("__id"),
        posexplode(filter(
          split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
          t => t =!= lit(""))))
      .select(col("__id"), col("pos").as("__p"), col("col").as("__w"))
    val dict = graft.core.Caches.persistTracked(
      words.select(col("__w")).distinct()
        .select(col("__w"), tokenize(col("__w"), merges).as("__t")))
    dict.count()
    (words, dict)
  }

  /** Join word occurrences to a per-word array dictionary and rebuild
    * document-order arrays: ONE token-grain shuffle (the doc-grain
    * groupBy), empty/null docs yield the empty array.
    */
  private def reassemble(
      df: DataFrame, idCol: String, words: DataFrame, dict: DataFrame,
      outCol: String, outType: String): DataFrame = {
    val toks = words.join(dict, Seq("__w"))
      .groupBy(col("__id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__p").as("p"), col("__t").as("t")))),
        s => s.getField("t"))).as(outCol))
    df.select(col(idCol))
      .join(toks, df(idCol) === toks("__id"), "left")
      .select(col(idCol),
        coalesce(col(outCol), array().cast(outType)).as(outCol))
  }

  /** The trained VOCABULARY as (token, token_id) — the integer-id
    * artifact a training pipeline ships with the merge table (GPT-2's
    * id convention re-derived): base symbols (the corpus's distinct
    * single-codepoint symbols under the charSeq split) take ids
    * 0..B-1 in binary string order, merge r's symbol `a||b` takes id
    * B + r - 1; if two merges produce the same string (possible:
    * (a, bc) and (ab, c) both yield "abc") the EARLIEST id wins.
    * Every token [[tokenize]] can emit over this corpus is covered:
    * subword sequences are compositions of base symbols through the
    * merge table.
    *
    * Scale: both relations are VOCABULARY-sized (base alphabet +
    * |merges| rows), so the single-partition id-assignment windows
    * are bounded by construction — the k-core finisher discipline,
    * never corpus-proportional.
    */
  def vocabTable(
      df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE corpus aggregation, collected: the base alphabet is distinct
    // single code points — bounded by Unicode itself (≤ ~1.1M rows),
    // never corpus-proportional. Collecting also removes the
    // id-assignment window AND the second scan a count + window plan
    // would pay (the window form re-executed the uncached histogram).
    // Driver sort = UTF-8 byte order, exactly Spark's and DuckDB's
    // binary string comparison.
    val baseToks = wordCounts(df, textCol)
      .select(explode(split(charSeq(col("word")), " ")).as("token"))
      .where(col("token") =!= lit(""))
      .distinct()
      .collect().map(_.getString(0)).sortWith(utf8Lt)
    val nBase = baseToks.length.toLong
    val baseIds = baseToks.zipWithIndex.toSeq
      .map { case (t, i) => (t, i.toLong) }
      .toDF("token", "token_id")
    val mergedIds = merges.sortBy(_.rank)
      .map(m => (m.a + m.b, nBase + m.rank - 1L))
      .toDF("token", "__id")
      .groupBy(col("token")).agg(min(col("__id")).as("token_id"))
    baseIds.unionByName(mergedIds)
      .select(col("token"), col("token_id"))
  }

  /** Tokenize to INTEGER IDS — the form the training loader consumes:
    * the dictionary-join path with the per-word subword arrays mapped
    * through `vocab` (a (token, token_id) relation, normally
    * [[vocabTable]]'s output; broadcast — it is vocabulary-sized).
    * Tokens absent from the vocabulary (possible when tokenizing a
    * DIFFERENT corpus than the vocabulary's) encode as -1, the
    * conventional unk sentinel. Returns (idCol, token_ids
    * array<long>); same one-token-grain-shuffle shape as
    * [[tokenizeByDict]].
    */
  def tokenizeToIds(
      df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], vocab: DataFrame): DataFrame = {
    val (words, dict) = wordsAndDict(df, textCol, idCol, merges)
    idsReassemble(df, idCol, words, dict, vocab)
  }

  /** Per-distinct-word id arrays: explode the (vocabulary-sized)
    * dictionary, map each subword through the broadcast vocab, and
    * re-assemble in subword order — all at dictionary grain, so the
    * occurrence join pays nothing extra. Shared by both conventions.
    */
  private[ops] def idsReassemble(
      df: DataFrame, idCol: String, words: DataFrame, dict: DataFrame,
      vocab: DataFrame): DataFrame = {
    val dictIds = dict
      .select(col("__w"), posexplode(col("__t")))
      .select(col("__w"), col("pos").as("__sp"), col("col").as("__tok"))
      .join(broadcast(vocab.select(col("token").as("__tok"),
        col("token_id"))), Seq("__tok"), "left")
      .groupBy(col("__w"))
      .agg(transform(
        array_sort(collect_list(struct(col("__sp").as("p"),
          coalesce(col("token_id"), lit(-1L)).as("t")))),
        s => s.getField("t")).as("__t"))
    reassemble(df, idCol, words, dictIds.select(col("__w"), col("__t")),
      "token_ids", "array<bigint>")
  }

  /** The byte-level VOCABULARY: the FULL 256-byte base alphabet takes
    * ids 0..255 regardless of what the training corpus contained — a
    * hex pair's id IS its byte value (the 256 pairs sort in numeric
    * byte order) — and merge r's symbol takes 256 + r - 1, earliest
    * id winning on duplicate strings. Because every
    * [[tokenizeByteLevel]] emission is a composition of byte symbols
    * through the merge table, [[tokenizeToIdsByteLevel]] can emit -1
    * on NO input, any corpus, by construction.
    */
  def vocabTableByteLevel(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val baseIds = (0 until 256).map(b => (f"$b%02X", b.toLong))
      .toDF("token", "token_id")
    val mergedIds = merges.sortBy(_.rank)
      .map(m => (m.a + m.b, 256L + m.rank - 1L))
      .toDF("token", "__id")
      .groupBy(col("token")).agg(min(col("__id")).as("token_id"))
    baseIds.unionByName(mergedIds)
      .select(col("token"), col("token_id"))
  }

  /** [[tokenizeToIds]] under the byte-level convention — byte-level
    * pretokens resolve through a byte-level dictionary; with a
    * [[vocabTableByteLevel]] vocabulary n_unk = 0 on any input by
    * construction.
    */
  def tokenizeToIdsByteLevel(
      df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], vocab: DataFrame): DataFrame = {
    val words = df.select(col(idCol).as("__id"),
        posexplode(pretokenizeByteLevel(col(textCol))))
      .select(col("__id"), col("pos").as("__p"), col("col").as("__w"))
    // Re-pretokenizing a single pretoken yields itself (each regex
    // alternative's language is closed under re-matching), so the
    // dictionary fold through the native expression is exact.
    val dict = graft.core.Caches.persistTracked(
      words.select(col("__w")).distinct()
        .select(col("__w"), tokenizeByteLevel(col("__w"), merges).as("__t")))
    // Eager: true dict stats before the occurrence join plans (see
    // wordsAndDict — unknown cached-relation size put the broadcast on
    // the occurrence side).
    dict.count()
    idsReassemble(df, idCol, words, dict, vocab)
  }

  /** The pure-Column reference spelling of [[tokenize]] (nested
    * codegen'd `replace` per occurrence — the semantics contract the
    * native expression is pinned against).
    */
  def tokenizeFold(text: Column, merges: Seq[Merge]): Column = {
    val words = filter(split(lower(trim(coalesce(text, lit("")))), "\\s+"),
      t => t =!= lit(""))
    flatten(transform(words, w => {
      val padded = concat(lit(" "), charSeq(w), lit(" "))
      val merged = merges.sortBy(_.rank).foldLeft(padded)((s, m) =>
        mergeOnce(s, m.a, m.b))
      split(trim(merged), " ")
    }))
  }
}
