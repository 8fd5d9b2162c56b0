package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Reference layout: ONE global (ord, id) sort + running sum. */
  private def expected(docs: Seq[(Long, Long)], budget: Long, salt: String)
      : Map[Long, (Long, Long)] = {
    var cum = 0L
    docs.map { case (id, n) => (md5hex(s"$salt:$id"), id, n) }
      .sortBy { case (ord, id, _) => (ord, id) }
      .map { case (_, id, n) =>
        val r = id -> (cum / budget, cum % budget); cum += n; r
      }.toMap
  }

  private def run(docs: Seq[(Long, Long)], budget: Long, hexChars: Int = 2,
      parts: Int = 5): Map[Long, (Long, Long, Long)] = {
    val df = docs.toDF("doc_id", "n").repartition(parts)
    Packing.pack(df, col("n"), budget, idCol = "doc_id", hexChars = hexChars)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("two-phase layout equals the single-global-window reference exactly") {
    val docs = (0L until 500L).map(i => i -> (1L + i % 37))
    val exp = expected(docs, budget = 64, salt = "epoch0")
    val got = run(docs, budget = 64)
    assert(got.size == 500)
    docs.foreach { case (id, n) =>
      val (gn, gs, go) = got(id)
      assert(gn == n)
      assert((gs, go) == exp(id), s"doc $id: got ($gs,$go) want ${exp(id)}")
    }
  }

  test("layout is invariant to partitioning and bucket width") {
    val docs = (0L until 300L).map(i => i -> (i % 20))
    val a = run(docs, budget = 50, hexChars = 2, parts = 1)
    val b = run(docs, budget = 50, hexChars = 2, parts = 11)
    val c = run(docs, budget = 50, hexChars = 3, parts = 4)
    assert(a == b, "partition count changed the layout")
    assert(a == c, "bucket width changed the layout")
  }

  test("a doc straddling the budget boundary gets the sequence its START lands in") {
    // one doc of 10 tokens with budget 7: whichever doc sorts first
    // starts at offset 0 in seq 0; the second starts at cum=10 -> seq 1
    val docs = Seq(1L -> 10L, 2L -> 10L)
    val got = run(docs, budget = 7)
    val bySeq = got.values.toSeq.sortBy(_._2)
    assert(bySeq.map(v => (v._2, v._3)) == Seq((0L, 0L), (1L, 3L)))
  }

  test("zero-token and missing-count docs still get deterministic positions") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(5L)))
      .toDF("doc_id", "n")
    val got = Packing.pack(df, col("n"), budget = 4, idCol = "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 4)
    assert(got(2L)._1 == 0L && got(3L)._1 == 0L, "null/zero widths are 0")
    val exp = expected(Seq(1L -> 5L, 2L -> 0L, 3L -> 0L, 4L -> 5L), 4, "epoch0")
    got.foreach { case (id, (_, s, o)) => assert((s, o) == exp(id)) }
  }

  test("a new salt is a new epoch order") {
    val docs = (0L until 200L).map(i => i -> 3L)
    val df = docs.toDF("doc_id", "n")
    def offs(salt: String) = Packing.pack(df, col("n"), 16, "doc_id", salt)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(offs("epoch0") != offs("epoch1"), "salt did not reshuffle")
  }

  test("invalid config is rejected") {
    val df = Seq((1L, 1L)).toDF("doc_id", "n")
    intercept[IllegalArgumentException](Packing.pack(df, col("n"), 0, "doc_id"))
    intercept[IllegalArgumentException](Packing.pack(df, col("n"), 8, "doc_id", hexChars = 0))
  }
}
