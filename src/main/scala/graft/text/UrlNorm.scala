package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the standard webtext dedup KEY
  * normalization (CCNet / RefinedWeb-style url-level dedup keys
  * collapse scheme/host case, `www.`, default ports, fragments and
  * tracking parameters before hashing). Reference semantics analog:
  * the identity stage's key extraction (Files.t:186-204) — this is
  * the key-building half a web corpus needs before it.
  *
  * Pure `Column` expression composition (codegen'd, no UDF), and —
  * deliberately — regex/substring primitives with identical
  * semantics in DuckDB, so the operator is oracle-checkable
  * end-to-end:
  *
  *   1. strip `#fragment`;
  *   2. lowercase the `scheme://host[:port]` prefix ONLY (paths stay
  *      case-sensitive), drop a leading `www.`, drop default ports
  *      (`:80` http, `:443` https);
  *   3. remove tracking parameters by exact query-string surgery:
  *      split at the first `?`, prefix every param with `&`, delete
  *      `&name=value` units whose name is a tracker
  *      (utm_*, gclid, fbclid, msclkid, mc_cid/mc_eid, igshid,
  *      ref_src, s_kwcid), re-join — a `&` in the PATH is never
  *      touched (no lookbehind tricks, RE2-safe);
  *   4. drop a bare trailing `?` and a trailing `/`.
  */
object UrlNorm {

  private val Trackers =
    "utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref_src|s_kwcid"

  /** The tracker alternation (exposed so oracle SQL and tests stay in
    * lockstep with the operator).
    */
  def trackerPattern: String = Trackers

  /** Canonical form of `url` (null-safe: null → null). */
  def canonicalUrl(url: Column): Column = {
    val s1 = regexp_replace(url, "#.*$", "")
    // scheme://host[:port] prefix; "" when the string is not a URL
    val hostPre = regexp_extract(s1, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val rest = s1.substr(length(hostPre) + lit(1), length(s1))
    val hp0 = lower(hostPre)
    val hp1 = regexp_replace(hp0, "^([a-z0-9+.-]+://)www\\.", "$1")
    val hp2 = regexp_replace(hp1, "^(https://[^:/]+):443$", "$1")
    val hp = regexp_replace(hp2, "^(http://[^:/]+):80$", "$1")
    val s2 = concat(hp, rest)
    val base = regexp_extract(s2, "^[^?]*", 0)
    val q = s2.substr(length(base) + lit(2), length(s2))
    val qq = regexp_replace(concat(lit("&"), q), s"&($Trackers)=[^&]*", "")
    val qClean = regexp_replace(qq, "^&", "")
    val joined = when(q === "" || qClean === "", base)
      .otherwise(concat(base, lit("?"), qClean))
    when(url.isNull, lit(null).cast("string"))
      .otherwise(regexp_replace(joined, "/$", ""))
  }

  /** Host of a URL, lowercased, port stripped; "" for non-URLs
    * (Spark's regexp_extract no-match convention, shared by DuckDB).
    */
  def host(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
      ":[0-9]+$", "")

  /** Registrable domain of a URL under the common-suffix heuristic:
    * the last two host labels, or the last THREE when the second-level
    * label is a conventional country-code second-level
    * (co|com|net|org|ac|gov|edu under a two-letter ccTLD — covers
    * co.uk/com.au/ac.jp-class suffixes). A full public-suffix list is
    * a data file, not an algorithm — swap the regex for a broadcast
    * PSL lookup in production; the heuristic keeps the operator
    * closed-form and oracle-checkable. IP-literal hosts have no
    * registrable domain — match blocklists on [[host]] for those.
    */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val three = regexp_extract(h,
      "([^.]+\\.(?:co|com|net|org|ac|gov|edu)\\.[a-z][a-z])$", 1)
    val two = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(three =!= "", three).otherwise(when(two =!= "", two).otherwise(h))
  }

  /** Domain blocklist filter (the C4/Dolma release-hygiene pass: drop
    * every document from a blocked site). Matching on the REGISTRABLE
    * domain makes subdomains free: any host under `spamfarm.co.uk`
    * matches the one blocklist entry. Codegen'd `isin` against a
    * driver-side list — the blocklist is config-sized; for a
    * million-entry list join against a broadcast table instead.
    * Null urls pass through: `null.isin(...)` is null and Filter
    * treats null as false, so without the explicit isNull arm a
    * hygiene flag would silently delete every url-less row — a doc
    * with no url matches no blocked domain by definition (the same
    * non-URL passthrough the empty-host case gets).
    */
  def dropBlockedDomains(docs: DataFrame, blocked: Seq[String],
      urlCol: String = "url"): DataFrame =
    docs.filter(col(urlCol).isNull ||
      !registrableDomain(col(urlCol)).isin(blocked: _*))
}
