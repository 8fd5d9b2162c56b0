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
