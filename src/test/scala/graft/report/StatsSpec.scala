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
}
