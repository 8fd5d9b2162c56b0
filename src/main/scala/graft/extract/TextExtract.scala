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

  def extractText(html: Column): Column = {
    // cast(binary→string) wraps the raw bytes unvalidated; Spark 4's
    // is_valid_utf8 then gates the quarantine path explicitly (ANSI
    // decode() would throw mid-pipeline on bad bytes — per-row
    // validity must be data, not an exception)
    val s0 = html.cast("string")
    val s1 = regexp_replace(s0, "(?is)<!DOCTYPE[^>]*>", " ")
    val s2 = regexp_replace(s1, "(?s)<!--.*?-->", " ")
    val s3 = regexp_replace(s2, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val s4 = regexp_replace(s3, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val s5 = regexp_replace(s4, "<[^>]*>", " ")
    val e1 = regexp_replace(s5, "&lt;", "<")
    val e2 = regexp_replace(e1, "&gt;", ">")
    val e3 = regexp_replace(e2, "&quot;", "\"")
    val e4 = regexp_replace(e3, "&#39;", "'")
    val e5 = regexp_replace(e4, "&nbsp;", " ")
    val e6 = regexp_replace(e5, "&amp;", "&")
    val t = trim(regexp_replace(e6, "\\s+", " "))
    // undecodable bytes → NULL (quarantined, counted, never silently
    // dropped — Files.t:290-299); null html propagates null.
    when(html.isNull, lit(null: String))
      .when(!call_function("is_valid_utf8", s0), lit(null: String))
      .otherwise(t)
  }
}
