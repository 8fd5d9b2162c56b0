package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlink extraction + the domain link graph — the web-GRAPH side of
  * a webtext pipeline (reference analog: none — [EXT] like the near-dup
  * stack; link structure drives the quality/spam signals crawl-based
  * corpora are filtered on, and is the input to [[graft.cluster
  * .PageRank]]). Everything here is RE2-safe codegen'd Columns (the
  * q_url_canon contract) so the DuckDB oracle runs the identical
  * chain.
  */
object Links {

  /** Absolute http(s) href values of an html string, document order.
    * Extraction stops at `"` or `#` (the fragment never names a
    * different page — same normalization [[graft.text.UrlNorm
    * .canonicalUrl]] applies); relative links are skipped (resolving
    * them needs the base url — a separate, stateful concern).
    */
  def hrefs(html: Column): Column =
    regexp_extract_all(html, lit("href=\"(https?://[^\"#]*)"), lit(1))

  /** The `<a href="URL" [attrs]>TEXT</a>` pattern shared by engine and
    * oracle: group 1 = the absolute http(s) url (fragment-stopped,
    * like [[hrefs]]), group 2 = the flat anchor text (anchors with
    * NESTED tags don't match — skipped whole by policy).
    * Attributes BEFORE href are not matched (href-first form only);
    * RE2-safe: no backrefs, no lookaround.
    */
  val AnchorPattern: String =
    "<a href=\"(https?://[^\"#]*)[^\"]*\"[^>]*>([^<]*)</a>"

  /** (href, anchor_text) pairs of an html string, document order —
    * the two capture groups extracted as parallel arrays and zipped
    * by position (`regexp_extract_all` yields one array per group on
    * both engines, and both arrays come from the SAME match list, so
    * positions align by construction).
    */
  def anchorPairs(html: Column): Column = {
    val urls = regexp_extract_all(html, lit(AnchorPattern), lit(1))
    val texts = regexp_extract_all(html, lit(AnchorPattern), lit(2))
    zip_with(urls, texts, (u, t) => struct(u.as("href"), t.as("anchor")))
  }

  /** The anchor-text table: one (dst_domain, anchor, n) row per
    * (target registrable domain, normalized anchor text) pair —
    * the classic query-independent relevance/quality signal (what
    * the web CALLS a page ranks it for; anchor corpora also feed
    * title-style training data). Anchor normalization = lowercase +
    * whitespace-collapse + trim; empty anchors and domain-less
    * targets are dropped. Map-side extract + explode, ONE
    * (dst_domain, anchor)-keyed count shuffle — a hub's anchors
    * partial-aggregate map-side.
    */
  def anchorTexts(docs: DataFrame, htmlCol: String = "html"): DataFrame =
    docs
      .select(explode(anchorPairs(col(htmlCol).cast("string"))).as("p"))
      .select(graft.text.UrlNorm.registrableDomain(col("p.href")).as("dst_domain"),
        trim(regexp_replace(lower(col("p.anchor")), "\\s+", " ")).as("anchor"))
      .filter(col("dst_domain") =!= "" && col("anchor") =!= "")
      .groupBy(col("dst_domain"), col("anchor"))
      .agg(count(lit(1)).as("n"))

  /** The registrable-domain link graph: one (src_domain, dst_domain,
    * n_links) row per ordered domain pair, link-occurrence weighted.
    * Map-side extract + explode, ONE (src, dst)-keyed count shuffle —
    * a hub domain's in-links partial-aggregate map-side. Self-links
    * survive (they are real signal: internal navigation density);
    * rows whose url or href yields no domain are dropped.
    */
  def domainEdges(docs: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val src = graft.text.UrlNorm.registrableDomain(col(urlCol))
    docs
      .select(src.as("src_domain"),
        explode(hrefs(col(htmlCol).cast("string"))).as("href"))
      .select(col("src_domain"),
        graft.text.UrlNorm.registrableDomain(col("href")).as("dst_domain"))
      .filter(col("src_domain") =!= "" && col("dst_domain") =!= "")
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))
  }
}
