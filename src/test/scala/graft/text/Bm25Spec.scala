package graft.text

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replica of the exact integer chain (micro-nat idf,
    * avg_milli, t_norm, floor division throughout).
    */
  private def reference(docs: Seq[(Long, String)], query: Seq[String]): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
      .filter(_._2.exists(_.nonEmpty))
    val n = toks.size.toLong
    val total = toks.map(_._2.size.toLong).sum
    val avgMilli = (total * 1000L) / n
    val tf = for {
      (id, ts) <- toks; q <- query
      c = ts.count(_ == q) if c > 0
    } yield (id, ts.size.toLong, q, c.toLong)
    val dfm = tf.groupBy(_._3).map { case (q, xs) => q -> xs.size.toLong }
    tf.groupBy(_._1).map { case (id, xs) =>
      val scores = xs.map { case (_, dl, q, c) =>
        val idf = math.round(math.log(1.0 + (n - dfm(q) + 0.5) / (dfm(q) + 0.5)) * 1e6)
        val tn = (22L * c * avgMilli * 100000L) /
          (10L * c * avgMilli + 3L * avgMilli + 9000L * dl)
        (idf * tn) / 1000000L
      }
      id -> (xs.size.toLong, scores.sum)
    }
  }

  test("BM25 integer scores match the closed-form reference at any partitioning") {
    val docs = Seq(
      (1L, "apple banana apple apple"),
      (2L, "banana cherry cherry"),
      (3L, "durian fig"),
      (4L, "apple apple apple apple apple apple apple apple"), // saturation
      (5L, "  "), // blank: excluded from corpus stats
      (6L, "grape apple"))
    val query = Seq("apple", "banana", "zebra") // zebra: absent term
    val expect = reference(docs, query)
    for (parts <- Seq(1, 5)) {
      val out = Bm25.scores(docs.toDF("doc_id", "text").repartition(parts), query)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out == expect, s"parts=$parts")
    }
    // structural sanity: docs 3 and 5 match nothing; saturation means
    // 8x apple scores less than 2x its t_norm-at-tf-1 but more than 1x
    assert(!expect.contains(3L) && !expect.contains(5L))
    assert(expect(4L)._2 > expect(6L)._2)
    assert(expect(1L)._1 == 2L) // apple + banana
  }

  test("rarer terms out-score common ones at equal tf and dl") {
    val docs = (1L to 20L).map(i => i -> (if (i <= 10) "common filler" else "filler pad")) :+
      (21L, "rare common") // 'rare' df=1, 'common' df=11, both tf=1 dl=2
    val out = Bm25.scores(docs.toDF("doc_id", "text"), Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ref = reference(docs, Seq("rare", "common"))
    assert(out == ref.map { case (k, v) => k -> v._2 })
    val rareOnly = ref(21L)._2 - ref(1L)._2 // doc 21's 'rare' share vs doc 1's 'common'
    assert(rareOnly > ref(1L)._2, "idf must dominate at equal tf/dl")
  }
}
