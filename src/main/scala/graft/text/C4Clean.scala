package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style page cleaning (Raffel et al. 2020 §2.2, the heuristics
  * behind the C4 corpus) with full text reconstruction:
  *
  * Line rules (a line survives iff ALL hold):
  *   - ends in a terminal punctuation mark (`.` `!` `?` `"`)
  *   - contains at least `minWords` words
  *   - does not contain the word "javascript" (case-insensitive)
  *
  * Page rules (the whole document is dropped — `clean_text` null —
  * when ANY fails):
  *   - at least `minLines` surviving lines
  *   - does not contain "lorem ipsum" (case-insensitive)
  *   - does not contain a curly bracket `{`
  *
  * Entirely MAP-SIDE: lines never leave their row (a HOF `filter`
  * over the split array + `array_join` reassembly — no explode, no
  * doc-keyed reassembly shuffle, unlike the cross-doc LineDedup
  * policies which must count occurrences globally). A 10^12-doc
  * corpus pays exactly one scan. The `lines` array is materialized
  * as its own projection before the filter consumes it and the
  * `kept` array before the page rules consume IT (SCALE.md
  * invariant 7 — CollapseProject duplicates cheap trees only, so the
  * chained selects below survive as stages). All predicates are
  * RE2-safe Column expressions, so a DuckDB oracle replicates the
  * policy exactly (the q_url_canon contract).
  */
object C4Clean {

  /** True iff `text` contains any blocklisted word or phrase
    * (whole-token, case-insensitive) — the other C4 §2.2 page gate:
    * the original dropped any page with a word on the LDNOOBW
    * blocklist. The list is caller config (this engine ships no word
    * list); entries must be lowercase ASCII `[a-z0-9 ]+` — enforced
    * fail-fast — which keeps the alternation metachar-free AND keeps
    * `\b` parity between Java (Unicode-aware) and the oracle's RE2
    * (ASCII-aware), the stopwordHits contract. Multi-word entries
    * match as exact token phrases. One codegen'd rlike, map-side.
    */
  def hasBlockedWord(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "blocklist must be non-empty")
    words.foreach(w => require(w.matches("[a-z0-9]+( [a-z0-9]+)*"),
      s"blocklist entries are lowercase ASCII words/phrases: '$w'"))
    lower(coalesce(text, lit(""))).rlike(words.mkString("\\b(", "|", ")\\b"))
  }

  /** `docs` minus every page matching the word blocklist (see
    * [[hasBlockedWord]]); null-text pages survive — they carry
    * nothing matchable and the empty/validity gates own them.
    */
  def dropBadWordPages(docs: DataFrame, words: Seq[String],
      textCol: String = "text"): DataFrame =
    docs.filter(!hasBlockedWord(col(textCol), words))

  /** The surviving lines of a MATERIALIZED `lines` array. */
  def keptLines(lines: Column, minWords: Int = 5): Column =
    filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "[ \\t]+")) >= minWords &&
        !lower(l).contains("javascript"))

  /** (id, clean_text, n_lines_kept, page_kept) per document;
    * `clean_text` is the newline-joined surviving lines, or null when
    * a page rule drops the document (null input text is an
    * empty-lines page and is dropped by `minLines`).
    */
  def cleanPages(docs: DataFrame, idCol: String = "id", textCol: String = "text",
      minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val pageKept = col("text").isNotNull &&
      size(col("kept")) >= minLines &&
      !lower(col("text")).contains("lorem ipsum") &&
      !col("text").contains("{")
    docs
      .select(col(idCol).as("id"), col(textCol).as("text"),
        split(coalesce(col(textCol), lit("")), "\n").as("lines"))
      .select(col("id"), col("text"), keptLines(col("lines"), minWords).as("kept"))
      .select(col("id"),
        when(pageKept, array_join(col("kept"), "\n")).as("clean_text"),
        size(col("kept")).cast("long").as("n_lines_kept"),
        coalesce(pageKept, lit(false)).as("page_kept"))
  }
}
