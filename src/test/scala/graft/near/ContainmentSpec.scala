package graft.near

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Int, Seq[String])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "blk", "toks")
  }

  test("article-inside-page: one-way containment 10^6 where Jaccard is ~10%") {
    val article = (0 until 5).map(i => s"w$i")
    val page = (0 until 50).map(i => s"w$i") // article's tokens ⊂ page's
    val other = (0 until 5).map(i => s"x$i") // disjoint
    val out = Containment.blockedContainment(
      df(Seq((1L, 7, article), (2L, 7, page), (3L, 7, other))), "doc_id", Seq("blk"), "toks")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out((1L, 2L)) == (1000000L, 100000L)) // C(article→page)=1, C(page→article)=0.1
    assert(out((1L, 3L)) == (0L, 0L)) // disjoint
    assert(out((2L, 3L)) == (0L, 0L))
  }

  test("containment is a SET measure: repeated tokens don't deflate the denominator") {
    // raw tokenized text repeats tokens; Broder containment is over
    // distinct shingles — [a,a,b] is fully inside [a,b,c]
    val out = Containment.blockedContainment(
      df(Seq((1L, 3, Seq("a", "a", "b")), (2L, 3, Seq("a", "b", "c")))),
      "doc_id", Seq("blk"), "toks")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out((1L, 2L)) == (1000000L, 666666L))
  }

  test("a null token array reports 0 ppm both ways, never a negative fraction") {
    val rows = Seq((1L, 4, Seq("a", "b")), (2L, 4, null: Seq[String]))
    val out = Containment.blockedContainment(df(rows), "doc_id", Seq("blk"), "toks")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out((1L, 2L)) == (0L, 0L))
  }

  test("two-sided block cap and empty-set guard") {
    val rows = (1L to 101L).map(i => (i, 5, Seq("a"))) :+ // over-cap block: excluded
      (200L, 6, Seq("a", "b")) :+ (201L, 6, Seq[String]()) :+ // empty side: 0 ppm, not 0/0
      (300L, 9, Seq("z")) // singleton block: no pairs
    val out = Containment.blockedContainment(df(rows), "doc_id", Seq("blk"), "toks")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set((200L, 201L)))
    assert(out((200L, 201L)) == (0L, 0L))
  }
}
