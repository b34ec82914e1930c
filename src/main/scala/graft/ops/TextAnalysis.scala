package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, n-gram-free language ID (stopword voting), and
  * rolling-hash fingerprinting. All pure builtin expressions so they run
  * inside whole-stage codegen over the scan — no UDFs.
  */
object TextAnalysis {

  /** Whitespace token count ('' -> 0). */
  def tokenCount(textCol: Column): Column =
    when(length(trim(textCol)) === 0, lit(0))
      .otherwise(size(split(trim(textCol), "\\s+")))

  /** BPE-ish subword count: word-piece regex split (letters runs, digit
    * runs, single punctuation), approximating tokenizer granularity.
    */
  def subwordCount(textCol: Column): Column =
    size(filter(
      split(textCol, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"),
      t => length(trim(t)) > 0))

  /** Ratio of punctuation chars to total chars (0 for empty). */
  def punctRatio(textCol: Column): Column = {
    val totalLen = length(textCol)
    val punct = totalLen - length(regexp_replace(textCol, "[\\p{Punct}]", ""))
    when(totalLen === 0, lit(0.0)).otherwise(punct.cast("double") / totalLen)
  }

  /** Ratio of uppercase letters to all letters (0 when no letters). */
  def uppercaseRatio(textCol: Column): Column = {
    val letters = length(regexp_replace(textCol, "[^\\p{L}]", ""))
    val uppers = length(regexp_replace(textCol, "[^\\p{Lu}]", ""))
    when(letters === 0, lit(0.0)).otherwise(uppers.cast("double") / letters)
  }

  /** Mean whitespace-token length (0 for empty text). */
  def meanWordLength(textCol: Column): Column = {
    val toks = tokenCount(textCol)
    val chars = length(regexp_replace(trim(textCol), "\\s+", ""))
    when(toks === 0, lit(0.0)).otherwise(chars.cast("double") / toks)
  }

  private val StopwordsEn = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
  private val StopwordsDe = Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit", "den", "von")
  private val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "por")
  private val StopwordsFr = Seq("le", "la", "les", "de", "et", "un", "est", "que", "pour", "dans")

  private def stopwordHits(textCol: Column, words: Seq[String]): Column = {
    val toks = split(lower(trim(textCol)), "\\s+")
    size(filter(toks, t => t.isin(words: _*)))
  }

  /** Fraction of tokens that are English stopwords — a quality /
    * English-ness signal.
    */
  def stopwordRatio(textCol: Column): Column = {
    val toks = tokenCount(textCol)
    when(toks === 0, lit(0.0))
      .otherwise(stopwordHits(textCol, StopwordsEn).cast("double") / toks)
  }

  /** Heuristic language ID by stopword voting across en/de/es/fr;
    * "und" (undetermined) when no list scores > 0. Deterministic
    * tie-break by list order (en, de, es, fr).
    */
  def langIdHeuristic(textCol: Column): Column = {
    val scores = Seq(
      "en" -> stopwordHits(textCol, StopwordsEn),
      "de" -> stopwordHits(textCol, StopwordsDe),
      "es" -> stopwordHits(textCol, StopwordsEs),
      "fr" -> stopwordHits(textCol, StopwordsFr))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]: rewards moderate length, low
    * punctuation, low uppercase, plausible word lengths. Deterministic
    * double arithmetic (same per-row fold everywhere).
    */
  def qualityScore(textCol: Column): Column = {
    val lenScore = least(length(textCol).cast("double") / 500.0, lit(1.0))
    val punctPenalty = least(punctRatio(textCol) * 5.0, lit(1.0))
    val upperPenalty = least(uppercaseRatio(textCol) * 3.0, lit(1.0))
    val mwl = meanWordLength(textCol)
    val wordScore = when(mwl >= 3.0 && mwl <= 10.0, lit(1.0)).otherwise(lit(0.5))
    round(greatest(lit(0.0),
      lenScore * 0.4 + wordScore * 0.3 + (lit(1.0) - punctPenalty) * 0.2 +
        (lit(1.0) - upperPenalty) * 0.1), 4)
  }

  /** Polynomial rolling-hash document fingerprint (base-31 over UTF-8
    * bytes via builtin HOF fold) — stable across partitions/executors.
    */
  def rollingHashFingerprint(textCol: Column): Column =
    aggregate(
      transform(split(textCol, ""), ch => ascii(ch).cast("long")),
      lit(7L), (acc, c) => acc * 31L + c)
}
