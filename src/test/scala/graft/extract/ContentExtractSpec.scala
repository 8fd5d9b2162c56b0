package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContentExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String, minChars: Int = 25, linkDen: Int = 3) = {
    val out = ContentExtract.mainContent(
        Seq((1L, html)).toDF("doc_id", "html"),
        col("html"), minChars = minChars, linkDen = linkDen)
      .collect()(0)
    (Option(out.getString(1)), out.getLong(2), out.getLong(3))
  }

  test("keeps content paragraphs, drops the nav link farm and the footer") {
    val html =
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/a\">About this site</a> " +
        "<a href=\"/c\">Contact and imprint</a></nav>" +
        "<p>This paragraph carries the actual article content of the page, " +
        "long enough and with no links at all.</p>" +
        "<p>A second content paragraph with an inline <a href=\"/ref\">ref</a> " +
        "link that stays well under the density threshold.</p>" +
        "<div class=\"footer\"><a href=\"/terms\">Terms of service</a> " +
        "<a href=\"/privacy\">Privacy policy statement</a></div>" +
        "</body></html>"
    val (text, nBlocks, nGood) = run(html)
    assert(nBlocks == 4 && nGood == 2)
    val t = text.get
    assert(t.startsWith("This paragraph carries"))
    assert(t.contains("\nA second content paragraph"))
    assert(t.contains("ref link")) // inline anchor text kept inside its block
    assert(!t.contains("Home") && !t.contains("Privacy"))
  }

  test("density is integer cross-multiplication in the clean normal form") {
    // clean = "xxxxx yyyyy" (11 chars), link_chars = 5 -> 5*3=15 > 11 dropped
    val dense = "<p><a href=\"/x\">xxxxx</a> yyyyy</p>"
    assert(run(dense, minChars = 5)._3 == 0)
    // clean = "xxxxx yyyyy zzz" (15 chars), 5*3=15 <= 15 kept (boundary)
    val ok = "<p><a href=\"/x\">xxxxx</a> yyyyy zzz</p>"
    assert(run(ok, minChars = 5) == (Some("xxxxx yyyyy zzz"), 1L, 1L))
    // anchor text is normalized before counting: tags + entities + ws
    val norm = "<p><a href=\"/x\"> x&amp;x   <b>x</b> </a> yyyyy zzzz</p>"
    // anchor clean = "x&x x" (5), block clean = "x&x x yyyyy zzzz" (16)
    assert(run(norm, minChars = 5) == (Some("x&x x yyyyy zzzz"), 1L, 1L))
  }

  test("short blocks drop; br splits a link run; script/comments never count") {
    val html =
      "<script>var x = 'a very long script body that must never appear';</script>" +
        "<!-- hidden comment content --><p>tiny</p>" +
        "<a href=\"/1\">one link</a><br><a href=\"/2\">two link</a>" +
        "<p>The one real content sentence of this fixture, nicely long.</p>"
    val (text, nBlocks, nGood) = run(html)
    assert(nGood == 1 && nBlocks == 4)
    assert(text.get == "The one real content sentence of this fixture, nicely long.")
  }

  test("head/title and noscript are metadata, never content blocks") {
    val html =
      "<head><title>Breaking news: a descriptive page title well over the floor</title>" +
        "<style>body { color: red }</style></head>" +
        "<body><noscript>Please enable JavaScript to view this page properly.</noscript>" +
        "<p>The body paragraph is the only real content on this page.</p></body>"
    val (text, nBlocks, nGood) = run(html)
    assert(nGood == 1)
    assert(text.get == "The body paragraph is the only real content on this page.")
    assert(nBlocks == 1) // title/noscript never even count as blocks
  }

  test("quarantine and empties: null html, invalid utf8, no good blocks") {
    val rows = Seq(
      (1L, "<p>ok content block long enough to pass the floor easily</p>".getBytes("UTF-8")),
      (2L, null),
      (3L, Array[Byte](0x66, (0xFF).toByte, (0xFE).toByte)),
      (4L, "<p>all<br>short</p>".getBytes("UTF-8")))
    val out = ContentExtract.mainContent(
        rows.toDF("doc_id", "raw"), col("raw"))
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1.get.startsWith("ok content"))
    assert(out(2L) == ((None, 0L, 0L)))
    assert(out(3L) == ((None, 0L, 0L)))
    assert(out(4L) == ((Some(""), 2L, 0L))) // blocks exist, none good
    intercept[IllegalArgumentException] {
      ContentExtract.mainContent(rows.toDF("doc_id", "raw"), col("raw"), minChars = 0)
    }
  }
}
