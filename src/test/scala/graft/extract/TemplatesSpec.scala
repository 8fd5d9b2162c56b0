package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemplatesSpec extends SparkSpec {
  import spark.implicits._

  test("structureFingerprint depends on the tag skeleton only") {
    val rows = Seq(
      "<html><body><h1>Alpha</h1><p>one two</p></body></html>",
      "<html><body><h1>Beta gamma</h1><p>three</p></body></html>", // same skeleton
      "<HTML><BODY><H1>case</H1><P>normalized</P></BODY></HTML>",  // case-insensitive
      "<html><body><h1>x</h1><ul><li>different</li></ul></body></html>", // different
      "<html><body class=\"wide\" id=\"m\"><h1 data-x=\"1\">attrs ignored</h1><p>t</p></body></html>")
    val fps = rows.toDF("html")
      .select(Templates.structureFingerprint(col("html")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) == fps(2) && fps(0) == fps(4))
    assert(fps(3) != fps(0))
  }

  test("templateClusters groups per (domain, skeleton) and drops one-off pages") {
    val docs = Seq(
      (1L, "https://a.example/1", "<div><p>x</p></div>"),
      (2L, "https://www.a.example/2", "<div><p>y y</p></div>"), // www collapses into a.example
      (3L, "https://a.example/3", "<table><tr><td>z</td></tr></table>"), // singleton: dropped
      (4L, "https://b.example/1", "<div><p>same skeleton, other site</p></div>"),
      (5L, "https://b.example/2", "<div><p>w</p></div>"),
      (6L, null, "<div><p>null url dropped</p></div>"))
      .toDF("doc_id", "url", "html")
    val out = Templates.templateClusters(docs, minPages = 2)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(out == Seq(("a.example", 2L, 1L), ("b.example", 2L, 4L)))
  }
}
