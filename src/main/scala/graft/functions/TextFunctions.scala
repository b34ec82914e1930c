package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning column functions re-expressing the reference's scalar
  * string ops (SURVEY.md §2.7) as pure Catalyst built-in compositions —
  * codegen-friendly, no UDFs, so they stay inside whole-stage codegen
  * at 100 TB scan scale.
  *
  * Reference sites: transformers/utils/helpers.py:17-23,92-115 (F8/F9),
  * loaders/utils/helpers/llm.py:4-9 (F10), filtering.py:113-114 (F12),
  * transcript.py:159 (F13), transformers/utils/cleaning.py:46-50 (F14).
  */
object TextFunctions {

  /** F13: collapse all whitespace runs to single spaces and trim. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** F8 `clean_text_chunk`: profanity marker to stars, zero-width/nbsp
    * cleanup, caption artifacts (`>>`), bracketed tag removal, whitespace
    * collapse, trim. Order matters and mirrors the reference EXACTLY:
    * the profanity marker is `[\\u00a0__\\u00a0]` with NON-BREAKING
    * spaces (helpers.py:18) and is replaced BEFORE nbsp->space
    * normalization; an ASCII-space `[ __ ]` is NOT a profanity marker
    * and falls through to bracket-tag removal, like the reference.
    */
  def cleanTextChunk(c: Column): Column = {
    val profanity = regexp_replace(c, "\\[\\u00a0__\\u00a0\\]", "****")
    val zw        = regexp_replace(profanity, "\\u200b", "")
    val nbsp      = regexp_replace(zw, "\\u00a0", " ")
    val arrows    = regexp_replace(nbsp, ">>", "")
    val tags      = regexp_replace(arrows, "\\[[^\\]]*\\]", "")
    normalizeWhitespace(tags)
  }

  /** F9/F10 `clean_response`: keep only text after the last LLM preamble
    * marker, strip CHUNK tags, fold smart quotes to ASCII, trim.
    */
  def cleanLlmResponse(c: Column): Column = {
    val afterMarker = element_at(
      split(c, "Here is the cleaned chunk:|Here's the cleaned chunk:|</think>"), -1)
    val noTags = regexp_replace(afterMarker, "</?CHUNK>", "")
    trim(translate(noTags, "‘’“”", "''\"\""))
  }

  /** F12: escape SQL LIKE wildcards `%` and `_` with a backslash. */
  def escapeLikeWildcards(c: Column): Column =
    regexp_replace(c, "([%_])", "\\\\$1")

  /** F11: comma-joined host string -> array, with ''/null -> empty array. */
  def splitHosts(c: Column): Column =
    when(c.isNull || c === "", array().cast("array<string>"))
      .otherwise(split(c, ","))

  /** F11 inverse: host array -> comma-joined string (null-safe). */
  def joinHosts(c: Column): Column = concat_ws(",", c)

  /** F14: escape braces for prompt templating ({ -> {{, } -> }}). */
  def escapeBraces(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\{", "{{"), "\\}", "}}")
}
