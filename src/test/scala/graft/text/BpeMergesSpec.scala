package graft.text

import graft.SparkSpec

/** BPE pair counting over the word-count table: closed-form counts,
  * overlapping occurrences, frequency weighting, deterministic tie
  * order in the top-k cut.
  */
class BpeMergesSpec extends SparkSpec {
  import spark.implicits._

  test("pair counts: overlap + frequency weighting, closed form") {
    // vocab: "aaa"×2 (pairs aa,aa each), "ab"×3, "ba"×1, "x"×1 (no pair)
    val docs = Seq((0L, "aaa ab AB x"), (1L, "aaa ab ba")).toDF("doc_id", "text")
    val r = BpeMerges.pairCounts(docs).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("aa" -> 4L, "ab" -> 3L, "ba" -> 1L))
  }

  test("topMerges: (count desc, pair asc) total order decides ties") {
    val docs = Seq((0L, "xy zw xy zw ab")).toDF("doc_id", "text")
    val top = BpeMerges.topMerges(docs, k = 2).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    // xy and zw tie at 2 → lexicographic keeps xy before zw; ab (1) cut
    assert(top == Seq(("xy", 2L), ("zw", 2L)))
  }

  test("single-char words contribute nothing; blank/null docs ignored") {
    val docs = Seq((0L, Some("a b c")), (1L, Some("  ")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    assert(BpeMerges.pairCounts(docs).count() == 0L)
  }
}
