package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  test("urls: loc/lastmod extraction, whitespace, missing loc dropped, case-insensitive tags") {
    val xml =
      "<?xml version=\"1.0\"?><urlset>" +
        "<url><loc>https://a.example/p1</loc><lastmod>2026-01-02</lastmod></url>" +
        "<URL><LOC>\n  https://a.example/p2  \n</LOC></URL>" +
        "<url><lastmod>2026-01-03</lastmod></url>" + // no loc: dropped
        "<url><loc>https://other.example/x</loc></url>" +
        "</urlset>"
    val out = Sitemaps.urls(Seq(("a.example", xml)).toDF("domain", "sitemap_xml"))
      .collect().map(r => (r.getString(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      ("https://a.example/p1", Some("2026-01-02")),
      ("https://a.example/p2", None),
      ("https://other.example/x", None)))
  }

  test("coverage: canonical join across surface-form disagreements, per-domain counts") {
    val sm = Seq(
      ("a.example", "HTTPS://A.example:443/p1/"), // canon = https://a.example/p1
      ("a.example", "https://www.a.example/p1"),  // same canon: ONE distinct entry
      ("a.example", "https://a.example/missing"),
      ("b.example", "https://b.example/only-listed")).toDF("domain", "loc")
    val cr = Seq(
      ("a.example", "https://WWW.a.example/p1"),  // matches via canon
      ("a.example", "https://a.example/uncharted"),
      ("c.example", "https://c.example/crawled-only")).toDF("domain", "url")
    val out = Sitemaps.coverage(sm, cr)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      "a.example" -> ((2L, 2L, 1L)),
      "b.example" -> ((1L, 0L, 0L)),
      "c.example" -> ((0L, 1L, 0L))))
  }

  test("indexUrls: child sitemaps extracted, wrapper tag immune, urlset entries invisible") {
    val xml =
      "<?xml version=\"1.0\"?><sitemapindex>" +
        "<sitemap><loc> https://a.example/sm/1.xml </loc><lastmod>2026-03-01</lastmod></sitemap>" +
        "<SITEMAP><LOC>https://a.example/sm/2.xml</LOC></SITEMAP>" +
        "<sitemap><lastmod>2026-01-01</lastmod></sitemap>" + // no loc: dropped
        "</sitemapindex>"
    val out = Sitemaps.indexUrls(Seq(("a.example", xml)).toDF("domain", "sitemap_xml"))
      .collect().map(r => (r.getString(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      ("https://a.example/sm/1.xml", Some("2026-03-01")),
      ("https://a.example/sm/2.xml", None)))
    // the two entry shapes are disjoint: an index file has no <url>
    // entries and a urlset has no <sitemap> entries
    assert(Sitemaps.urls(Seq(("a.example", xml)).toDF("domain", "sitemap_xml"))
      .count() == 0L)
    val urlset = "<urlset><url><loc>https://a.example/p</loc></url></urlset>"
    assert(Sitemaps.indexUrls(Seq(("a.example", urlset)).toDF("domain", "sitemap_xml"))
      .count() == 0L)
  }

  test("coverage: null urls filtered, empty sitemap side yields crawl-only rows") {
    val sm = Seq.empty[(String, String)].toDF("domain", "loc")
    val cr = Seq(("d.example", "https://d.example/p"),
      ("d.example", null)).toDF("domain", "url")
    val out = Sitemaps.coverage(sm, cr)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map("d.example" -> ((0L, 1L, 0L))))
  }
}
