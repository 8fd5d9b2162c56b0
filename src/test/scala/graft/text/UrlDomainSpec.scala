package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlDomainSpec extends SparkSpec {
  import spark.implicits._

  private def domainsOf(urls: Seq[String]): Seq[(String, String)] =
    urls.toDF("url")
      .select(col("url"), UrlNorm.registrableDomain(col("url")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq

  test("registrable domain: two-label default, three-label cc second-levels, case/port-insensitive") {
    val got = domainsOf(Seq(
      "https://ads.tracker.example/p/1",
      "http://www.spamfarm.co.uk/x",
      "https://a.b.deep.spamfarm.co.uk/y",
      "HTTPS://News.Example.ORG:8443/z",
      "http://example.com/q",
      "https://student.portal.ac.jp/page",
      "not a url at all",
      "https://localhost/admin")).toMap
    assert(got("https://ads.tracker.example/p/1") == "tracker.example")
    assert(got("http://www.spamfarm.co.uk/x") == "spamfarm.co.uk")
    assert(got("https://a.b.deep.spamfarm.co.uk/y") == "spamfarm.co.uk")
    assert(got("HTTPS://News.Example.ORG:8443/z") == "example.org")
    assert(got("http://example.com/q") == "example.com")
    assert(got("https://student.portal.ac.jp/page") == "portal.ac.jp")
    assert(got("not a url at all") == "", "non-URL: empty host, empty domain")
    assert(got("https://localhost/admin") == "localhost", "single-label host falls back to itself")
  }

  test("dropBlockedDomains removes every subdomain of a blocked registrable domain, keeps the rest") {
    val docs = Seq(
      ("https://ads.tracker.example/a", "t1"),
      ("https://sub.deep.spamfarm.co.uk/b", "t2"),
      ("https://www.spamfarm.co.uk/c", "t3"),
      ("https://news.example.org/d", "t4"),
      ("https://spamfarm.co.uk.evil.example/e", "t5"), // NOT blocked: registrable = evil.example
      ("nota url", "t6")).toDF("url", "text")
    val kept = UrlNorm.dropBlockedDomains(docs, Seq("tracker.example", "spamfarm.co.uk"))
      .select("text").collect().map(_.getString(0)).toSet
    assert(kept == Set("t4", "t5", "t6"))
  }

  test("dropBlockedDomains passes null urls through (r5 review: Filter treats null as false)") {
    val docs = Seq(
      (null: String, "nullurl"),
      ("https://ads.tracker.example/a", "blocked"),
      ("https://news.example.org/d", "kept")).toDF("url", "text")
    val kept = UrlNorm.dropBlockedDomains(docs, Seq("tracker.example"))
      .select("text").collect().map(_.getString(0)).toSet
    assert(kept == Set("nullurl", "kept"),
      "a doc with no url matches no blocked domain — it must not vanish")
  }
}
