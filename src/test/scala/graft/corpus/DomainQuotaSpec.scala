package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainQuotaSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference: global per-domain rank in (score desc, md5,
    * id) order — the order the two-phase decomposition must preserve. */
  private def refTopK(rows: Seq[(Long, String, Long)], k: Int): Map[String, Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def ord(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.groupBy(_._2).map { case (dom, rs) =>
      dom -> rs.sortBy { case (id, _, sc) => (-sc, ord(id), id) }.take(k).map(_._1)
    }
  }

  private def run(rows: Seq[(Long, String, Long)], k: Int, parts: Int,
      hexChars: Int = 2): Map[String, Seq[(Long, Long)]] =
    DomainQuota.cap(rows.toDF("id", "domain", "score").repartition(parts),
        col("domain"), col("score"), k, hexChars = hexChars)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
      .groupBy(_._1)
      .map { case (d, rs) => d -> rs.sortBy(_._3).map(t => (t._2, t._3)).toSeq }

  test("top-k per domain matches the global-rank reference at any partitioning") {
    val rows: Seq[(Long, String, Long)] =
      (1L to 60L).map(i => (i, s"d${i % 3}.example", (i * 7) % 11))
    for (k <- Seq(1, 5, 30); parts <- Seq(1, 8)) {
      val out = run(rows, k, parts)
      val expect = refTopK(rows, k)
      assert(out.keySet == expect.keySet, s"k=$k parts=$parts")
      for ((d, kept) <- expect) {
        assert(out(d).map(_._1) == kept, s"k=$k parts=$parts domain=$d")
        assert(out(d).map(_._2) == (1L to kept.size.toLong), s"ranks k=$k $d")
      }
    }
  }

  test("mega-domain skew: one domain, hexChars=1 buckets, phase-1 cut is lossless") {
    // many ties: every score appears ~125 times — the tie order (md5)
    // must survive the bucket decomposition exactly
    val rows: Seq[(Long, String, Long)] =
      (1L to 500L).map(i => (i, "mega.example", i % 4))
    val out = run(rows, 7, 16, hexChars = 1)
    assert(out("mega.example").map(_._1) == refTopK(rows, 7)("mega.example"))
  }

  test("k >= group size keeps everything; null domain and null score rank last") {
    val rows = Seq(
      (1L, "a.example", java.lang.Long.valueOf(5L)),
      (2L, "a.example", null),
      (3L, null, java.lang.Long.valueOf(1L)),
      (4L, null, java.lang.Long.valueOf(9L)))
    val out = DomainQuota.cap(rows.toDF("id", "domain", "score"),
        col("domain"), col("score"), 10)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(3))).toSet
    assert(out == Set((1L, Some("a.example"), 1L), (2L, Some("a.example"), 2L),
      (4L, None, 1L), (3L, None, 2L)))
    intercept[IllegalArgumentException] {
      DomainQuota.cap(rows.toDF("id", "domain", "score"),
        col("domain"), col("score"), 0)
    }
  }
}
