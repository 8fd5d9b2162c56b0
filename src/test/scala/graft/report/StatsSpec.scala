package graft.report

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Lower-bound quantile reference over a sorted seq. */
  private def refQuantile(vs: Seq[Long], q: Int): Long = {
    val sorted = vs.sorted
    val k = (q.toLong * vs.size + 99) / 100
    sorted((k - 1).toInt)
  }

  test("exactQuantiles matches order-statistics on ties and skew at any partitioning") {
    val vs: Seq[Long] = Seq.fill(40)(7L) ++ (1L to 30L) ++ Seq.fill(5)(1000L)
    val qs = Seq(1, 25, 50, 75, 95, 100)
    val expect = qs.map(q => q -> refQuantile(vs, q)).toMap
    for (parts <- Seq(1, 4)) {
      val out = Quantiles.exactQuantiles(
          vs.toDF("v").repartition(parts), "v", qs)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(out == expect, s"parts=$parts")
    }
    assert(expect(100) == 1000L && expect(50) == 7L) // tie mass pins the median
  }

  test("exactQuantiles: n=1, nulls excluded, duplicate qs collapse") {
    val df = Seq[java.lang.Long](42L, null).toDF("v")
    val out = Quantiles.exactQuantiles(df, "v", Seq(50, 50, 100))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(50 -> 42L, 100 -> 42L))
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "v", Seq(0))
    }
  }

  test("domainStats counts docs, distinct texts and byte mass per registrable domain") {
    val docs = Seq(
      (1L, "https://www.a.example/1", "same text"),
      (2L, "https://a.example/2?utm_source=x", "same text"), // dup within a.example
      (3L, "https://a.example/3", "other"),
      (4L, "https://b.example/1", "same text"), // same text, other domain: NOT a dup there
      (5L, null, "dropped"),
      (6L, "https://b.example/2", null)) // null text counts as one (empty) distinct
      .toDF("doc_id", "url", "text")
    val out = DomainStats.domainStats(docs)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out == Map(
      "a.example" -> (3L, 2L, 1L, 23L), // 9+9+5 chars
      "b.example" -> (2L, 2L, 0L, 9L)))
  }

  /** A distinct 20-token chunk: "<tag>0 <tag>1 ... <tag>19". */
  private def chunk(tag: String): String =
    (0 until 20).map(tag + _).mkString(" ")

  test("mirrorPairs counts distinct shared chunks per domain pair, d1 < d2") {
    val a = chunk("a"); val b = chunk("b"); val c = chunk("c"); val d = chunk("d")
    val docs = Seq(
      ("https://x.example/1", s"$a $b"),
      ("https://x.example/2", s"$a tail under twenty tokens"), // a repeated ON x: counts once
      ("https://y.example/1", s"$a $c"),
      ("https://z.example/1", s"$c $d"),
      ("https://z.example/2", null.asInstanceOf[String]), // null text: dropped
      (null.asInstanceOf[String], s"$a $c $d")) // url-less: no domain, dropped
      .toDF("url", "text")
    val out = DomainStats.mirrorPairs(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a is on x and y; c is on y and z; b, d and the short tail pair nothing
    assert(out == Map(
      ("x.example", "y.example") -> 1L,
      ("y.example", "z.example") -> 1L))
  }

  test("mirrorPairs: two-sided domain cap excludes universal boilerplate") {
    val u = chunk("u"); val v = chunk("v")
    val docs = (1 to 4).map(i => (s"https://d$i.example/p", s"$u $v")) ++
      Seq(("https://d1.example/q", chunk("w"))) // w on one domain only
    val df = docs.toDF("url", "text")
    // u and v are each on 4 domains: included at maxDomains = 4
    // (C(4,2) = 6 pairs, 2 shared chunks each), excluded at 3
    val wide = DomainStats.mirrorPairs(df, maxDomains = 4).collect()
    assert(wide.length == 6 && wide.forall(_.getLong(2) == 2L))
    assert(DomainStats.mirrorPairs(df, maxDomains = 3).isEmpty)
    intercept[IllegalArgumentException] { DomainStats.mirrorPairs(df, minDomains = 1) }
  }

  test("mirrorPairs: only full w-token chunks pair; partitioning-invariant") {
    val a = chunk("a")
    // y's page carries a PLUS 19 extra tokens — the partial tail chunk
    // never hashes, so only a itself links x and y
    val docs = Seq(
      ("https://x.example/1", a),
      ("https://y.example/1", s"$a ${(0 until 19).map("t" + _).mkString(" ")}"))
      .toDF("url", "text")
    for (parts <- Seq(1, 3)) {
      val out = DomainStats.mirrorPairs(docs.repartition(parts))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(out.toSeq == Seq(("x.example", "y.example", 1L)), s"parts=$parts")
    }
  }
}
