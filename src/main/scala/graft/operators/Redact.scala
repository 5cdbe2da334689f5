package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction over text columns — the scrub pass every web-scale
  * training corpus runs before release (emails, phone-shaped numbers,
  * IPv4 addresses → placeholder tokens), plus per-document hit counts
  * for audit reporting.
  *
  * The patterns are RE2-compatible (no backrefs, no lookaround), so the
  * SAME strings run under Spark's Java regex and an external engine's
  * RE2 — these constants are the single source of truth interpolated
  * into the DuckDB oracle. Everything is a narrow map over the text
  * column: no shuffle, stays inside whole-stage codegen via
  * `regexp_replace`/`regexp_count`.
  */
object Redact {

  /** user@host.tld (letters/digits/._%+- local, dotted domain, 2+ letter TLD). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style 555 exchange numbers (the fixture shape). */
  val PhonePattern = "\\b555-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (syntactic — no octet range check). */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Replacement order matters: emails first (their local/domain parts
    * contain dots and digits that the IP pattern could otherwise bite
    * into), then IPs, then phones.
    */
  def redactText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Adds `redacted` plus per-document `n_email` / `n_ip` / `n_phone`
    * hit counts (counted on the ORIGINAL text).
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_email", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_ip", regexp_count(col(textCol), lit(Ipv4Pattern)))
      .withColumn("n_phone", regexp_count(col(textCol), lit(PhonePattern)))
      .withColumn("redacted", redactText(col(textCol)))
}
