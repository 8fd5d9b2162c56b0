package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robotsA =
    """# site A policy
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |
      |User-agent: alpha
      |User-agent: graftbot
      |Disallow: /beta
      |Crawl-delay: 10
      |Disallow:
      |""".stripMargin
  private val robotsB =
    """User-agent: *
      |Disallow: /
      |""".stripMargin

  private def robots = Seq(
    ("a.example", robotsA), ("b.example", robotsB)).toDF("domain", "robots_txt")

  test("rules: grouping, multi-UA headers, comments, no-op and unknown lines") {
    val r = Robots.rules(robots).collect()
      .map(x => (x.getString(0), x.getString(1), x.getBoolean(2), x.getString(3))).toSet
    assert(r == Set(
      ("a.example", "*", false, "/private"),
      ("a.example", "*", true, "/private/ok"),
      ("a.example", "alpha", false, "/beta"),   // shared header: both agents
      ("a.example", "graftbot", false, "/beta"),
      ("b.example", "*", false, "/")))
  }

  test("verdicts: specific agent shadows *, longest match, allow wins ties, no-rule allows") {
    val urls = Seq(
      (1L, "https://a.example/private/x"),    // * says no — but graftbot group exists: allowed
      (2L, "https://a.example/beta/page"),    // graftbot group: disallowed
      (3L, "https://a.example/open"),         // no matching rule: allowed
      (4L, "https://b.example/anything"),     // no graftbot group: * applies, Disallow /: blocked
      (5L, "https://c.example/no-robots"),    // domain without robots: allowed
      (6L, "https://WWW.A.example/beta"))     // www + case collapse into a.example
      .toDF("doc_id", "url")
    val out = Robots.verdicts(urls, robots, "GraftBot")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), Option(r.getString(3)))).toMap
    assert(out == Map(
      1L -> (true, None), 2L -> (false, Some("/beta")), 3L -> (true, None),
      4L -> (false, Some("/")), 5L -> (true, None), 6L -> (false, Some("/beta"))))
    // an agent with no specific group anywhere: * governs both domains
    val star = Robots.verdicts(urls, robots, "otherbot")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), Option(r.getString(3)))).toMap
    assert(star(1L) == (false, Some("/private")) && star(2L) == (true, None))
    // longest-match + allow-beats-disallow-at-tie
    assert(star(5L) == (true, None))
    val deep = Seq((7L, "https://a.example/private/ok/deep")).toDF("doc_id", "url")
    assert(Robots.verdicts(deep, robots, "otherbot").collect()
      .map(r => (r.getBoolean(2), r.getString(3))).toSeq == Seq((true, "/private/ok")))
  }

  test("explicit whitelist: an all-no-op specific group still shadows * (RFC empty group)") {
    // the canonical whitelist pattern — the graftbot group EXISTS but
    // its only rule is the empty-path no-op; RFC 9309: an empty
    // matching group means allow-everything, NOT fall-through to *
    val wl = Seq(("w.example",
      "User-agent: *\nDisallow: /\nUser-agent: graftbot\nDisallow:\n"))
      .toDF("domain", "robots_txt")
    val urls = Seq((1L, "https://w.example/anything"),
      (2L, "https://w.example/")).toDF("doc_id", "url")
    val out = Robots.verdicts(urls, wl, "graftbot")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), Option(r.getString(3)))).toMap
    assert(out == Map(1L -> ((true, None)), 2L -> ((true, None))))
    // any other agent is still fully blocked by *
    val other = Robots.verdicts(urls, wl, "otherbot")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(other == Map(1L -> false, 2L -> false))
    // whitelist group FIRST (the common real layout): the no-op
    // Disallow: must still END the graftbot UA run — dropping it
    // before the group window would merge graftbot into the `*` run
    // and hand it 'Disallow: /'
    val wlFirst = Seq(("wf.example",
      "User-agent: graftbot\nDisallow:\nUser-agent: *\nDisallow: /\n"))
      .toDF("domain", "robots_txt")
    val u2 = Seq((1L, "https://wf.example/anything")).toDF("doc_id", "url")
    val first = Robots.verdicts(u2, wlFirst, "graftbot").collect()(0)
    assert(first.getBoolean(2) && first.getString(3) == null)
    val firstOther = Robots.verdicts(u2, wlFirst, "otherbot").collect()(0)
    assert(!firstOther.getBoolean(2))
  }

  test("invalid empty-token User-agent line is ignored: no group start, no run break") {
    // RFC 9309: unparseable lines are ignored as if absent. The empty
    // UA line must not start an agent-less group (orphaning /secret —
    // under-blocking) and must not end the preceding UA run
    val inv = Seq(("i.example",
      "User-agent: *\nDisallow: /a\nUser-agent:\nDisallow: /secret\n"))
      .toDF("domain", "robots_txt")
    val r = Robots.rules(inv).collect()
      .map(x => (x.getString(1), x.getBoolean(2), x.getString(3))).toSet
    assert(r == Set(("*", false, "/a"), ("*", false, "/secret")))
    val urls = Seq((1L, "https://i.example/secret/x")).toDF("doc_id", "url")
    assert(!Robots.verdicts(urls, inv, "anybot").collect()(0).getBoolean(2))
    // between two valid UA lines: both agents share one group
    val mid = Seq(("m.example",
      "User-agent: a\nUser-agent:\nUser-agent: b\nDisallow: /x\n"))
      .toDF("domain", "robots_txt")
    val rm = Robots.rules(mid).collect().map(_.getString(1)).toSet
    assert(rm == Set("a", "b"))
  }

  test("urlPath: authority stripped, pathless becomes /") {
    val out = Seq("https://a.example", "https://a.example/x?q=1#f", "http://a.example:8080/y")
      .toDF("u").select(Robots.urlPath(col("u"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("/", "/x?q=1#f", "/y"))
  }

  test("crawlDelays: group binding, presence shadowing, invalid/pre-group ignored, max") {
    val rb = Seq(
      // delay before any group binds nothing; * delay applies; the
      // invalid value is ignored
      ("a.example",
        """Crawl-delay: 99
          |User-agent: *
          |Crawl-delay: 10
          |Crawl-delay: fast
          |Disallow: /x
          |""".stripMargin),
      // specific group shadows *: its two delays resolve to the max
      ("b.example",
        """User-agent: *
          |Crawl-delay: 10
          |User-agent: graftbot
          |Crawl-delay: 4
          |Crawl-delay: 8
          |""".stripMargin),
      // specific whitelist with NO delay removes the * delay entirely
      ("c.example",
        """User-agent: *
          |Crawl-delay: 10
          |User-agent: graftbot
          |Disallow:
          |""".stripMargin),
      // no delays anywhere
      ("d.example", "User-agent: *\nDisallow: /\n")).toDF("domain", "robots_txt")
    val out = Robots.crawlDelays(rb, "GraftBot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a.example" -> 10.0, "b.example" -> 8.0))
  }

  test("sitemapDirectives: group-independent, case-insensitive, comments, dups, empty") {
    val rb = Seq(
      ("a.example",
        // before any group, then INSIDE a group (must not bind to it
        // or end the UA run — /deep still belongs to graftbot), then a
        // lowercase key, a comment-trailing line, a duplicate, and an
        // empty value
        """Sitemap: https://a.example/sm1.xml
          |User-agent: graftbot
          |sitemap: https://cdn.a.example/sm2.xml
          |Disallow: /deep
          |Sitemap: https://a.example/sm3.xml # primary
          |Sitemap: https://a.example/sm1.xml
          |Sitemap:
          |""".stripMargin),
      ("b.example", "User-agent: *\nDisallow: /\n")).toDF("domain", "robots_txt")
    val sm = Robots.sitemapDirectives(rb).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sm == Set(
      ("a.example", "https://a.example/sm1.xml"),
      ("a.example", "https://cdn.a.example/sm2.xml"),
      ("a.example", "https://a.example/sm3.xml")))
    // the in-group directive was an ignored unknown line for grouping:
    // /deep still binds to graftbot
    val r = Robots.rules(rb).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(3))).toSet
    assert(r == Set(
      ("a.example", "graftbot", "/deep"),
      ("b.example", "*", "/")))
  }
}
