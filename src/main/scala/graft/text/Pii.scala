package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the C4/Dolma pre-training hygiene pass (Dolma's
  * taggers redact emails / IP addresses / phone numbers before
  * release; reference analog: none — the reference dedups but never
  * rewrites content, this is [EXT] training-data scope): typed
  * placeholder redaction plus per-doc counts for filtering.
  *
  * Pure codegen'd Columns (regexp_replace / regexp_count — no UDF),
  * and every pattern is RE2-COMPATIBLE BY CONSTRUCTION (no
  * lookaround, no backreferences, explicit ASCII classes, `\b` only
  * at digit edges where Java and RE2 agree on ASCII text) so the
  * DuckDB oracle replays the IDENTICAL chain — the q_url_canon
  * contract.
  *
  * Scale shape: map-only, one projection over the corpus scan;
  * redaction order email → IPv4 → phone, so earlier placeholders
  * (digit-free) can never be re-matched by the later digit patterns.
  */
object Pii {

  /** ASCII email, the Dolma tagger shape. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4; `\b` keeps it off longer digit runs. Octet
    * values are not range-checked (0-999 accepted) — a redactor
    * over-redacting "999.1.1.1" is the safe direction for a
    * release-hygiene pass.
    */
  val Ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** NANP-ish phone: optional +CC group, optional (area), 3-3-4 digit
    * groups with -, ., or space separators (the whole CC group is
    * optional — a bare "555.987.6543" must match).
    */
  val PhoneRe = "(\\+?[0-9]{1,2}[-. ]?)?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Per-doc PII counts over the RAW text (each pattern independent —
    * the filtering signal: drop or route docs past a threshold).
    * Null text counts 0 (the quarantine convention).
    */
  def counts(text: Column): Seq[(String, Column)] = {
    def n(re: String) = coalesce(regexp_count(text, lit(re)), lit(0)).cast("long")
    Seq("n_emails" -> n(EmailRe), "n_ipv4" -> n(Ipv4Re), "n_phones" -> n(PhoneRe))
  }

  /** Text with every match replaced by a typed placeholder. Email
    * first, then IPv4, then phone: the placeholders contain no
    * digits, so a later pattern can never match inside an earlier
    * redaction. Null text stays null (no row vanishes).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
