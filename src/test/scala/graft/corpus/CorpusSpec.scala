package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.extract.TextExtract

/** Corpus generator determinism + the extraction invariant
  * (FIXTURES.md §1/§4; input_hint "byte-identical extracted text per
  * url").
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val N = 500L

  test("generator is deterministic: same seed, same bytes") {
    val a = Corpus.docs(spark, 100).collect().sortBy(_.url)
    val b = Corpus.docs(spark, 100).collect().sortBy(_.url)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.url == y.url && x.text == y.text &&
        java.util.Arrays.equals(x.html, y.html) &&
        x.warc_ts == y.warc_ts && x.lang == y.lang)
    }
  }

  test("urls are unique (the object id)") {
    val d = Corpus.docs(spark, N)
    assert(d.select("url").distinct().count() == N)
  }

  test("extraction invariant: TextExtract(html) is byte-identical to text for every row") {
    val d = Corpus.docs(spark, N).toDF()
    val bad = d.withColumn("ex", TextExtract.extractText(col("html")))
      .filter(!(col("ex") <=> col("text")))
    assert(bad.count() == 0, bad.select("url").collect().take(5).mkString(","))
  }

  test("planted classes appear with expected structure") {
    val t = Corpus.truth(spark, N)
    val byKind = t.groupBy("truth_kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("unique") == N * 60 / 100)
    assert(byKind("exact_dup") == N * 15 / 100)
    assert(byKind("alias") == N * 5 / 100)
    assert(byKind("empty") == N * 5 / 100)
    assert(byKind("undecodable") == N * 5 / 100)
    assert(byKind("near_dup_95") + byKind("near_dup_80") + byKind("near_dup_50") == N * 10 / 100)
  }

  test("exact-dup groups share identical html; uniques do not collide") {
    val d = Corpus.docs(spark, N).toDF()
    val t = Corpus.truth(spark, N).toDF()
    val j = d.join(t, "url")
    val g = j.filter(col("truth_kind") === "exact_dup")
      .groupBy("truth_group")
      .agg(countDistinct(sha2(col("html"), 256)).as("nh"), count(lit(1)).as("n"))
    assert(g.filter(col("nh") =!= 1).count() == 0)
    assert(g.filter(col("n") < 2).count() == 0)
    val u = j.filter(col("truth_kind") === "unique")
      .groupBy(sha2(col("html"), 256)).count().filter(col("count") > 1)
    assert(u.count() == 0)
  }

  test("undecodable rows have NULL text and extractor quarantines them") {
    val d = Corpus.docs(spark, N).toDF()
    val t = Corpus.truth(spark, N).toDF()
    val und = d.join(t, "url").filter(col("truth_kind") === "undecodable")
    assert(und.filter(col("text").isNotNull).count() == 0)
    assert(und.filter(TextExtract.extractText(col("html")).isNotNull).count() == 0)
  }

  test("empty docs: html is zero bytes, text empty string (kept by default, Files.t:253-258)") {
    val d = Corpus.docs(spark, N).toDF()
    val t = Corpus.truth(spark, N).toDF()
    val emp = d.join(t, "url").filter(col("truth_kind") === "empty")
    assert(emp.filter(octet_length(col("html")) =!= 0).count() == 0)
    assert(emp.filter(col("text") =!= "").count() == 0)
  }

  test("alias groups share html and normalize to the same url") {
    val d = Corpus.docs(spark, N).toDF()
    val t = Corpus.truth(spark, N).toDF()
    val al = d.join(t, "url").filter(col("truth_kind") === "alias")
    val norm = graft.report.Urls.normalize(col("url"))
    val g = al.groupBy("truth_group")
      .agg(countDistinct(sha2(col("html"), 256)).as("nh"), countDistinct(norm).as("nu"))
    assert(g.filter(col("nh") =!= 1 || col("nu") =!= 1).count() == 0)
  }
}
