package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The C4 line-heuristic cleaning pass (Raffel et al. 2020, §2.2 — the
  * rules that built C4 from Common Crawl), completing the named-
  * pipeline quality stack next to the Gopher rules
  * ([[QualityFilter]]), the badwords blocklist ([[Blocklist]] — C4's
  * page-drop list), and the three-sentence span dedup ([[SpanDedup]]):
  *
  *  LINE level (a line survives iff ALL hold):
  *   - ends in a terminal punctuation mark: '.', '!', '?', or '"'
  *     (the paper's "end quotation mark");
  *   - contains at least `minLineWords` (3) whitespace words;
  *   - does not contain "javascript" case-insensitively.
  *  PAGE level ([[c4Rules]], first-failing-rule funnel order):
  *   - too_few_sentences: fewer than `minSentences` (5) sentences,
  *     counted as terminal marks '.', '!', '?' in the CLEANED text
  *     (the convention the open reimplementations converged on —
  *     documented so the oracle replays it);
  *   - lorem_ipsum: the raw page contains "lorem ipsum" (any case);
  *   - curly_brace: the raw page contains '{'.
  *
  * Everything is a map-only builtin-Column composition over the scan —
  * no shuffle, no UDFs; the oracle recomputes each quantity from the
  * same line/word conventions as the rest of the suite (trimmed
  * non-empty newline segments, `\s+` words).
  */
object C4Filter {

  private def lines(textCol: Column): Column =
    filter(transform(split(coalesce(textCol, lit("")), "\n"), l => trim(l)),
      l => l =!= lit(""))

  /** The surviving lines under the three C4 line rules. */
  def keptLines(textCol: Column, minLineWords: Int = 3): Column =
    filter(lines(textCol), l =>
      substring(l, -1, 1).isInCollection(Seq(".", "!", "?", "\"")) &&
        size(filter(split(l, "\\s+"), w => w =!= lit(""))) >= minLineWords &&
        !contains(lower(l), lit("javascript")))

  /** Per-document cleaning stats: struct(clean_text, n_lines, n_kept,
    * n_sentences) — cleaned text re-joined with single newlines in
    * original order (free: lines are filtered in place), sentence
    * count = terminal marks in the cleaned text.
    */
  def lineCleanStats(textCol: Column, minLineWords: Int = 3): Column = {
    val kept = keptLines(textCol, minLineWords)
    val clean = array_join(kept, "\n")
    struct(
      clean.as("clean_text"),
      size(lines(textCol)).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      (length(clean) -
        length(regexp_replace(clean, "[.!?]", ""))).cast("long")
        .as("n_sentences"))
  }

  /** C4's page-drop rules over the cleaned text (funnel order as
    * documented on the object).
    */
  def c4Rules(
      textCol: Column,
      minSentences: Int = 5,
      minLineWords: Int = 3): Seq[QualityFilter.Rule] = {
    val st = lineCleanStats(textCol, minLineWords)
    Seq(
      QualityFilter.Rule("too_few_sentences",
        st.getField("n_sentences") < minSentences),
      QualityFilter.Rule("lorem_ipsum",
        contains(lower(coalesce(textCol, lit(""))), lit("lorem ipsum"))),
      QualityFilter.Rule("curly_brace",
        contains(coalesce(textCol, lit("")), lit("{"))))
  }
}
