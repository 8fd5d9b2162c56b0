package graft.extract

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pinned extraction fixture (FIXTURES.md §4): byte-exact
  * (html, expected text) pairs. The `input_hint` invariant is
  * "byte-identical extracted text per url" — any change to
  * TextExtract that alters these outputs is a breaking change.
  */
class ExtractGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val golden: Seq[(Array[Byte], String)] = Seq(
    // plain body
    "<html><body><p>hello world</p></body></html>" -> "hello world",
    // entities, decode order (&amp; last)
    "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y</p>" ->
      "a & b <tag> \"q\" 's' x y",
    // double-escaped stays single-decoded
    "<p>&amp;lt;</p>" -> "&lt;",
    // script/style/comment stripped, title kept
    "<head><title>T</title><style>p { color: red }</style>" +
      "<script>var x = '<p>not text</p>';</script></head><body>B</body>" -> "T B",
    // multiline script with attributes
    "<script type=\"text/javascript\">\nif (a < b) { f(); }\n</script>ok" -> "ok",
    // whitespace collapsing + trim
    "  <p>a</p>\n\t<p>b   c</p>  " -> "a b c",
    // doctype + nested tags
    "<!DOCTYPE html><html><body><div><span>x</span> <b>y</b></div></body></html>" -> "x y",
    // empty body
    "<html><body></body></html>" -> "",
    // empty input
    "" -> "",
    // tags split across text
    "<p>one</p><p>two</p>" -> "one two",
    // comment containing tag-like text
    "<!-- <p>ghost</p> -->real" -> "real",
    // non-english text (utf-8 multibyte)
    "<p>ü ñ 漢字 é</p>" -> "ü ñ 漢字 é",
    // attributes with angle-ish content
    "<a href=\"/x?a=1&amp;b=2\">link</a>" -> "link",
    // style with nested braces
    "<style>@media (x) { p { a: b } }</style>done" -> "done"
  ).map { case (h, t) => (h.getBytes(StandardCharsets.UTF_8), t) }

  test("golden html→text pairs extract byte-identically") {
    val df = golden.zipWithIndex
      .map { case ((h, t), i) => (i, h, t) }
      .toDF("i", "html", "expected")
    val bad = df.withColumn("got", TextExtract.extractText(col("html")))
      .filter(!(col("got") <=> col("expected")))
      .select("i", "expected", "got").collect()
    assert(bad.isEmpty, bad.map(r => s"[${r.getInt(0)}] exp=[${r.getString(1)}] got=[${r.get(2)}]").mkString("; "))
  }

  test("undecodable byte sequences extract to NULL (quarantine)") {
    val cases = Seq(
      Array[Byte](0xff.toByte, 0xfe.toByte, 0x41),
      Array[Byte](0x41, 0x42, 0xc3.toByte), // truncated 2-byte seq
      Array[Byte](0xed.toByte, 0xa0.toByte, 0x80.toByte) // utf-16 surrogate
    )
    val df = cases.map(Tuple1(_)).toDF("html")
      .select(TextExtract.extractText(col("html")).as("t"))
    assert(df.filter(col("t").isNotNull).count() == 0)
  }
}
