package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup-key normalization every web-crawl
  * pipeline applies before URL-level dedup: two crawls of the same page
  * differ by tracking params, fragments, and host casing, and without
  * canonicalization each variant survives exact dedup.
  *
  * All steps are RE2-compatible regex rewrites (single source of truth
  * for external oracles, same pattern style as [[Redact]]): narrow map,
  * no shuffle, whole-stage codegen.
  */
object Urls {

  /** scheme://host[:port] prefix — the capture used for lowercasing. */
  val SchemeHostPattern = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"

  /** #fragment suffix. */
  val FragmentPattern = "#.*$"

  /** One utm_* tracking param (with its leading separator; a following
    * separator, if any, is promoted by [[canonicalizeUrl]]'s cleanup).
    */
  val UtmParamPattern = "[?&]utm_[A-Za-z0-9_]*=[^&#]*"

  /** Lowercase scheme+host, strip the fragment, strip utm_* params,
    * then repair the query-separator chain (`?&` → `?`, dangling `?`/
    * `&` removed). Pure function of the input string.
    */
  def canonicalizeUrl(u: Column): Column = {
    // 1. fragment off first so utm matching never crosses into it
    val noFrag = regexp_replace(u, FragmentPattern, "")
    // 2. utm params off (each match eats ITS leading ? or &)
    val noUtm = regexp_replace(noFrag, UtmParamPattern, "")
    // 3. if the FIRST surviving param lost its '?' (because a removed
    // utm param carried it), restore '?': "...path&a=1" -> "...path?a=1"
    val fixed = regexp_replace(
      regexp_replace(noUtm, "\\?&", "?"),
      "^([^?]*)&", "$1?")
    // 4. dangling trailing ? or &
    val trimmed = regexp_replace(fixed, "[?&]$", "")
    // 5. lowercase scheme://host, keep the rest byte-for-byte
    val m = regexp_extract(trimmed, SchemeHostPattern, 1)
    when(length(m) > 0,
      concat(lower(m), trimmed.substr(length(m) + 1, length(trimmed))))
      .otherwise(trimmed)
  }

  /** Registered-domain-ish host extraction (last two labels). */
  def urlHost(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
}
