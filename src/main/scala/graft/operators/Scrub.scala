package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for web-scale training corpora — the redaction pass every
  * published pipeline runs before training (emails/IPs/phones; cf. Dolma,
  * Penedo et al. '23 §2.5, and the C4 badwords pass they descend from).
  * Supersedes the minimal scalar [[graft.functions.TextFunctions.scrubPii]]
  * (kept stable as the q72 surface) with IPv4s, international phones,
  * per-category counts, and the sequential no-double-count rule.
  *
  * Three properties matter at 100 TB and all three hold here:
  *  - PURE NARROW MAP: regexp_replace / regexp_extract_all are built-in
  *    codegen'd expressions — no UDF, no shuffle, no state; the pass
  *    pipelines inside whole-stage codegen with whatever scan feeds it.
  *  - ENGINE-PORTABLE SEMANTICS: the patterns use only constructs whose
  *    match sets agree between Java regex (Spark) and RE2 (DuckDB and
  *    most scrubbing services): character classes, bounded counted
  *    repetition, non-capturing groups, word boundaries — no lookaround,
  *    no backreferences. The DuckDB oracle twin runs the IDENTICAL
  *    patterns.
  *  - SEQUENTIAL REDACTION, STAGE-LOCAL COUNTS: emails are redacted
  *    first, then IPs, then phones, each pass running on the PREVIOUS
  *    pass's output, and each count is taken on the text that pass
  *    actually saw — so a digit run inside an email is never also counted
  *    as a phone, and the counts always describe exactly the
  *    replacements made.
  */
object Scrub {

  /** user@host.tld with the usual local-part charset. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like 1.2.3.4000
    * don't half-match. (Octet range is NOT validated — scrubbing wants
    * recall; 999.1.1.1 redacts too, exactly like the RE2-based scrubbers
    * this mirrors.)
    */
  val Ipv4Pattern: String = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** International-format phone: leading +, then 7+ digits/dashes/spaces,
    * ending on a digit. The mandatory + keeps recall useful without
    * eating every long number in prose.
    */
  val PhonePattern: String = "\\+\\d[\\d\\- ]{7,}\\d"

  private def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Redact emails → IPv4s → phones in `textCol`, appending:
    * `redacted` (the scrubbed text), `n_email`, `n_ip`, `n_phone`
    * (replacements made by each stage). The input column is left
    * untouched so callers can audit.
    */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    val t3 = regexp_replace(t2, PhonePattern, "<PHONE>")
    df.withColumn("n_email", countMatches(t0, EmailPattern))
      .withColumn("n_ip", countMatches(t1, Ipv4Pattern))
      .withColumn("n_phone", countMatches(t2, PhonePattern))
      .withColumn("redacted", t3)
  }
}
