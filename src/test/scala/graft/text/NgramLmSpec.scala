package graft.text

import graft.SparkSpec

/** Bigram-LM scoring: counts and micro-nat log-probs verified against
  * closed-form arithmetic on a tiny corpus; integer-sum determinism;
  * unseen-bigram add-one floor when scoring a different corpus.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "a b", "a b", "a c" → unigrams a:3 b:2 c:1, V=3
  // bigrams: "a b":2, "a c":1
  private def docs = Seq(
    (0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")

  private def micro(cBig: Long, cUni: Long, v: Long): Long =
    math.round(math.log((cBig + 1.0) / (cUni + v)) * 1e6)

  test("scoreSelf: closed-form micro-nat sums per doc") {
    val r = NgramLm.scoreSelf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    val ab = micro(2, 3, 3) // ln(3/6)
    val ac = micro(1, 3, 3) // ln(2/6)
    assert(r(0L)._1 == 1L && r(0L)._2 == ab)
    assert(math.abs(r(0L)._3 - ab / 1e6) < 1e-9)
    assert(r(1L)._2 == ab)
    assert(r(2L)._2 == ac)
    assert(math.abs(r(2L)._3 - ac / 1e6) < 1e-9)
  }

  test("zero-bigram docs (blank, single-token, null) appear with zeros") {
    val d = Seq((0L, Some("a b")), (1L, Some("solo")), (2L, Some("  ")),
      (3L, None: Option[String])).toDF("doc_id", "text")
    val r = NgramLm.scoreSelf(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r.size == 4)
    assert(r(1L) == ((0L, 0L, 0.0)))
    assert(r(2L) == ((0L, 0L, 0.0)))
    assert(r(3L) == ((0L, 0L, 0.0)))
    assert(r(0L)._1 == 1L)
  }

  test("unseen bigrams under a foreign model hit the add-one floor") {
    val model = NgramLm.train(docs)
    // "b a": bigram unseen (c_big=0), w1="b" seen with c_uni=2
    // "z z": both unseen → c_big=0, c_uni=0
    val eval = Seq((10L, "b a"), (11L, "z z")).toDF("doc_id", "text")
    val r = NgramLm.score(eval, model).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(10L) == micro(0, 2, 3)) // ln(1/5)
    assert(r(11L) == micro(0, 0, 3)) // ln(1/3)
  }

  test("case folding: tokens are lowercased before counting") {
    val d = Seq((0L, "A b"), (1L, "a B")).toDF("doc_id", "text")
    val r = NgramLm.scoreSelf(d).collect().map(_.getLong(2)).distinct
    assert(r.length == 1) // both docs are the same bigram after folding
  }
}
