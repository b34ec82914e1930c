package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass a
  * training-data pipeline runs before anything else sees the corpus
  * (the pattern-based approach used by public pipelines such as Dolma
  * and the BigScience ROOTS preprocessing: regex families for emails,
  * phone numbers, and IP addresses, replaced with typed placeholder
  * tokens).
  *
  * Everything here is `regexp_replace`/`regexp_extract_all` over
  * codegen'd built-ins — no UDFs — so the scan stays inside whole-stage
  * codegen and the scrub is a map-only pass: no shuffle, linear in
  * corpus bytes, trivially parallel at 100 TB. Patterns deliberately use
  * the portable regex subset (character classes, bounded quantifiers,
  * `\b`) that means the same thing to Java's engine (Spark) and RE2
  * (DuckDB and most scan-side engines), so the oracle can mirror the
  * scrub byte-for-byte.
  */
object Pii {

  /** Email: local part, @, dotted domain with an alphabetic TLD. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-format phone: +CC-NNN-NNN-NNNN. */
  val PhoneRe: String = "\\+\\d{1,3}-\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 (syntactic — no range check, matching the
    * cheap-scan practice; 999.0.0.1 is redacted too, which is the safe
    * direction for a scrubber).
    */
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redactEmails(text: Column): Column =
    regexp_replace(text, lit(EmailRe), lit("<EMAIL>"))

  def redactPhones(text: Column): Column =
    regexp_replace(text, lit(PhoneRe), lit("<PHONE>"))

  def redactIpv4(text: Column): Column =
    regexp_replace(text, lit(Ipv4Re), lit("<IP>"))

  /** All three families. Email first: its charset can contain digit
    * runs, so scrubbing it before the numeric families means their
    * placeholders can never split a partially-redacted address.
    */
  def redactAll(text: Column): Column =
    redactIpv4(redactPhones(redactEmails(text)))

  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))

  def countPhones(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  def countIpv4(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
}
