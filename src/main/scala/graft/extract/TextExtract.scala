package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic html→text extraction (SURVEY.md §7.1 module 3).
  *
  * The `input_hint` per-row invariant is "byte-identical extracted text
  * per url" — this function is the single definition of that text, and
  * the golden fixture in ExtractSpec pins its bytes; any change here
  * that alters them is a breaking change (FIXTURES.md §4).
  *
  * Built entirely from codegen'd Catalyst expressions (decode /
  * regexp_replace / replace / trim) — no UDF, so at 100 TB the
  * extraction stage stays inside WholeStageCodegen and the html column
  * is read exactly once per row.
  *
  * Pipeline: strict-ish UTF-8 decode (invalid sequences surface as
  * U+FFFD and null the row out — the quarantine path, reference
  * unreadable-file skip Files.pm:229-233) → strip doctype, comments,
  * script/style blocks, tags → decode the 5 core entities (&amp; last)
  * → collapse whitespace → trim.
  */
object TextExtract {

  /** Doctype + comment strip — the first steps of every html chain. */
  private[extract] def stripDocComments(c: Column): Column =
    regexp_replace(regexp_replace(c, "(?is)<!DOCTYPE[^>]*>", " "),
      "(?s)<!--.*?-->", " ")

  /** Remove a whole `<tag ...>...</tag>` block (dotall, case-
    * insensitive) — script/style here, +head/noscript in
    * [[ContentExtract]].
    */
  private[extract] def stripBlock(c: Column, tag: String): Column =
    regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag>", " ")

  /** Tag strip → the 5 core entities (&amp; last) → whitespace
    * collapse → trim: THE normal form both the page-level extraction
    * and [[ContentExtract]]'s per-block units share (one definition,
    * so an entity or whitespace fix can never diverge them).
    */
  private[extract] def stripTagsNormalize(c: Column): Column = {
    val s = regexp_replace(c, "<[^>]*>", " ")
    val e1 = regexp_replace(s, "&lt;", "<")
    val e2 = regexp_replace(e1, "&gt;", ">")
    val e3 = regexp_replace(e2, "&quot;", "\"")
    val e4 = regexp_replace(e3, "&#39;", "'")
    val e5 = regexp_replace(e4, "&nbsp;", " ")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(regexp_replace(e6, "\\s+", " "))
  }

  /** Quarantine gate: null html or invalid UTF-8 → null, else
    * `cleaned` (undecodable bytes are counted, never silently
    * dropped — Files.t:290-299). cast(binary→string) wraps the raw
    * bytes unvalidated; Spark 4's is_valid_utf8 then gates
    * explicitly (ANSI decode() would throw mid-pipeline on bad
    * bytes — per-row validity must be data, not an exception).
    */
  private[extract] def utf8Gate(html: Column, cleaned: Column): Column =
    when(html.isNull, lit(null: String))
      .when(!call_function("is_valid_utf8", html.cast("string")),
        lit(null: String))
      .otherwise(cleaned)

  def extractText(html: Column): Column = {
    val s0 = html.cast("string")
    val cleaned = stripTagsNormalize(
      stripBlock(stripBlock(stripDocComments(s0), "script"), "style"))
    utf8Gate(html, cleaned)
  }
}
