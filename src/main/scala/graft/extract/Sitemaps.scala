package graft.extract

import graft.text.UrlNorm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap ingestion + crawl-coverage audit — the operations half of
  * the crawl-policy block ([[Robots]] decides what MAY be fetched;
  * this measures what a sitemap SAYS exists vs what the crawl actually
  * captured — the per-site completeness report a crawl operator reads
  * before re-seeding).
  *
  * Parsing is the sitemaps.org `<urlset>` XML protocol reduced to its
  * wire shape: `<url>` entries, a required `<loc>`, an optional
  * `<lastmod>`. Entries without a loc are dropped; surrounding
  * whitespace inside the tags is insignificant (protocol §"XML tag
  * definitions"). Regex extraction, not an XML parser, deliberately:
  * real-crawl sitemaps are routinely mal-nested, and the two fields
  * used here are flat — the same RE2-safe primitive set the rest of
  * the extract package uses, so the whole chain stays codegen'd and
  * oracle-checkable.
  *
  * Coverage joins on [[UrlNorm.canonicalUrl]] of BOTH sides — sitemap
  * locs and crawled urls disagree on case, `www.`, default ports and
  * trailing slashes constantly; matching surface strings would
  * under-report every site.
  *
  * Scale shape: parsing is a pure map stage (one sitemap body → its
  * entries, exploded in-task); coverage is two map-side-combinable
  * distincts co-partitioned with one (domain, canonical-url) full
  * outer join, then a per-domain count agg. Sitemap bodies never
  * shuffle — only (domain, url) pairs do.
  */
object Sitemaps {

  /** `<url>` entry bodies (group 1), dotall + case-insensitive. */
  val EntryPattern: String = "(?is)<url\\b[^>]*>(.*?)</url>"

  /** `<sitemapindex>` `<sitemap>` entry bodies (group 1) — the `\b`
    * keeps the wrapper `<sitemapindex>` tag itself from matching.
    */
  val IndexEntryPattern: String = "(?is)<sitemap\\b[^>]*>(.*?)</sitemap>"

  /** `<loc>` / `<lastmod>` inner text, whitespace-insensitive. */
  val LocPattern: String = "(?is)<loc>\\s*(.*?)\\s*</loc>"
  val LastmodPattern: String = "(?is)<lastmod>\\s*(.*?)\\s*</lastmod>"

  /** Shared (domain, loc, lastmod) extraction for both entry shapes:
    * explode the entry bodies, pull the two flat fields, drop loc-less
    * entries. Pure map stage — bodies explode in-task.
    */
  private def entryTable(src: DataFrame, domainCol: String, xmlCol: String,
      entryPattern: String): DataFrame =
    src
      .select(col(domainCol).as("domain"),
        explode(regexp_extract_all(col(xmlCol), lit(entryPattern), lit(1)))
          .as("entry"))
      .select(col("domain"),
        regexp_extract(col("entry"), LocPattern, 1).as("loc"),
        nullif(regexp_extract(col("entry"), LastmodPattern, 1), lit(""))
          .as("lastmod"))
      .filter(col("loc") =!= "")

  /** One row per sitemap `<url>` entry: (domain, loc, lastmod) —
    * lastmod null when absent; entries without a `<loc>` dropped.
    */
  def urls(sitemaps: DataFrame, domainCol: String = "domain",
      xmlCol: String = "sitemap_xml"): DataFrame =
    entryTable(sitemaps, domainCol, xmlCol, EntryPattern)

  /** One row per `<sitemapindex>` `<sitemap>` entry: (domain, loc,
    * lastmod) — the CHILD sitemap urls of an index file, how sites
    * past the protocol's 50k-url/50MB per-file cap expose their url
    * space (protocol §"Using sitemap index files"; the entry shape is
    * `<url>`'s with the tag renamed, same required `<loc>` / optional
    * `<lastmod>`). Completes the fetch loop:
    * [[Robots.sitemapDirectives]] → fetch → indexes here → fetch
    * children → [[urls]] → [[coverage]]. `lastmod` is the recrawl
    * signal — a scheduler diffs it against the last fetch to skip
    * unchanged children.
    */
  def indexUrls(indexes: DataFrame, domainCol: String = "domain",
      xmlCol: String = "sitemap_xml"): DataFrame =
    entryTable(indexes, domainCol, xmlCol, IndexEntryPattern)

  /** Per-domain crawl coverage: n_sitemap / n_crawled / n_both count
    * DISTINCT canonical urls listed by the sitemap, captured by the
    * crawl, and present in both. Inputs are (domain, url) frames —
    * `sitemapUrls` typically [[urls]]' output, `crawled` the corpus.
    */
  def coverage(sitemapUrls: DataFrame, crawled: DataFrame,
      domainCol: String = "domain", sitemapUrlCol: String = "loc",
      crawledUrlCol: String = "url"): DataFrame = {
    def canon(df: DataFrame, urlCol: String, flag: String): DataFrame =
      df.select(col(domainCol).as("domain"),
          UrlNorm.canonicalUrl(col(urlCol)).as("cu"))
        .filter(col("cu").isNotNull)
        .distinct()
        .withColumn(flag, lit(1L))
    canon(sitemapUrls, sitemapUrlCol, "in_sm")
      .join(canon(crawled, crawledUrlCol, "in_cr"), Seq("domain", "cu"),
        "full_outer")
      .groupBy("domain")
      .agg(
        sum(coalesce(col("in_sm"), lit(0L))).as("n_sitemap"),
        sum(coalesce(col("in_cr"), lit(0L))).as("n_crawled"),
        sum(when(col("in_sm").isNotNull && col("in_cr").isNotNull, 1L)
          .otherwise(0L)).as("n_both"))
  }
}
