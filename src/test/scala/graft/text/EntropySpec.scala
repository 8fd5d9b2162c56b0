package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntropySpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replica of the exact integer chain (micro-nat ln per
    * distinct count, floor division).
    */
  private def reference(text: String, maxChars: Int): (Long, Long, Long) = {
    val counts = text.take(maxChars).groupBy(identity).map(_._2.length.toLong)
    val n = counts.sum
    def lnMicro(x: Long) = math.round(math.log(x.toDouble) * 1e6)
    val s = counts.map(c => c * lnMicro(c)).sum
    (n, counts.size.toLong, lnMicro(n) - s / n)
  }

  test("charEntropy matches the closed-form integer reference at any partitioning") {
    val docs = Seq(
      (1L, "aaaa"),               // zero entropy
      (2L, "abcd"),               // uniform: ln 4
      (3L, "aab"),                // mixed
      (4L, "x" * 3000 + "y" * 10), // cap: only the first 2048 chars count
      (5L, ""),                   // empty: excluded
      (6L, "The quick brown fox jumps over the lazy dog"))
    val expect = docs.filter(_._2.nonEmpty)
      .map { case (id, t) => id -> reference(t, 2048) }.toMap
    for (parts <- Seq(1, 4)) {
      val out = Entropy.charEntropy(docs.toDF("doc_id", "text").repartition(parts))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(out == expect, s"parts=$parts")
    }
    assert(expect(1L)._3 == 0L)                    // single char: H = 0
    assert(expect(2L)._3 == math.round(math.log(4.0) * 1e6)) // uniform: ln 4 exactly
    assert(expect(4L)._1 == 2048L)                 // cap applied
    assert(!expect.contains(5L))
    assert(expect(6L)._3 > expect(3L)._3)          // richer alphabet, higher H
  }

  test("cap changes the measured window, not the formula") {
    val docs = Seq((1L, "ab" * 100)).toDF("doc_id", "text")
    val full = Entropy.charEntropy(docs, maxChars = 200).collect().head
    val cut = Entropy.charEntropy(docs, maxChars = 3).collect().head
    assert(full.getLong(1) == 200L && cut.getLong(1) == 3L)
    // "aba": counts 2,1 — reference value
    assert((cut.getLong(2), cut.getLong(3)) == (2L, reference("aba", 3)._3))
  }
}
