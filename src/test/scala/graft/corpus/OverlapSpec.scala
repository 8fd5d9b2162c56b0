package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.near.Hashing

/** Cross-source shingle-overlap audit: exact pairs vs hand-computed
  * sets, sketch ≡ Hashing.minhash on the same sets, and the estimate's
  * deterministic endpoints (identical sets → 1.0, disjoint → 0.0).
  */
class OverlapSpec extends SparkSpec {
  import spark.implicits._

  // k=2 shingles. srcA and srcB share exactly one bigram ("b c");
  // srcC is byte-identical to srcA (J=1); srcD is disjoint from all.
  private def corpus = Seq(
    (0L, "A", "a b c"),     // shingles {a b, b c}
    (1L, "B", "b c d"),     // shingles {b c, c d}
    (2L, "C", "a b c"),     // = srcA
    (3L, "D", "x y z")      // {x y, y z}
  ).toDF("doc_id", "source", "text")

  test("exactPairs: hand-computed intersections, zero-pair rows present") {
    val r = Overlap.exactPairs(corpus, k = 2).collect()
      .map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    assert(r.size == 6) // all C(4,2) pairs, including zero-overlap ones
    assert(r(("A", "B")) == ((2L, 2L, 1L, 0.333333)))
    assert(r(("A", "C")) == ((2L, 2L, 2L, 1.0)))
    assert(r(("A", "D")) == ((2L, 2L, 0L, 0.0)))
    assert(r(("B", "C"))._3 == 1L)
    assert(r(("C", "D"))._3 == 0L)
  }

  test("sketches match Hashing.minhash on the same shingle sets") {
    val sk = Overlap.sketches(corpus, k = 2, perms = 32, seed = 7L)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    // reproduce srcA's shingle-set member hashes: xxhash64 of the
    // joined lowercase bigram strings, via Spark itself (same hash fn)
    def memberHashes(shs: Seq[String]): Array[Long] =
      shs.toDF("sh").select(xxhash64(col("sh"))).collect().map(_.getLong(0))
    val expA = Hashing.minhash(memberHashes(Seq("a b", "b c")), 32, 7L)
    val expD = Hashing.minhash(memberHashes(Seq("x y", "y z")), 32, 7L)
    assert(sk("A").sameElements(expA))
    assert(sk("C").sameElements(expA)) // identical set, identical sketch
    assert(sk("D").sameElements(expD))
  }

  test("estimatePairs: identical sets estimate exactly 1.0, disjoint exactly 0.0") {
    val est = Overlap.estimatePairs(corpus, k = 2, perms = 64, seed = 11L)
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getDouble(2))).toMap
    assert(est(("A", "C")) == 1.0)
    assert(est(("A", "D")) == 0.0)
    assert(est(("C", "D")) == 0.0)
    // the shared-one-of-three pair lands between the endpoints
    assert(est(("A", "B")) > 0.0 && est(("A", "B")) < 1.0)
  }

  test("estimate tracks exact on a larger deterministic corpus") {
    // two 200-shingle sources sharing exactly 100 shingles: J = 1/3
    val docs = ((0 until 201).map(i => (i.toLong, "P", s"p$i p${i + 1}")) ++
      (0 until 201).map(i => (i + 500L, "Q", s"p${i + 100} p${i + 101}")))
      .toDF("doc_id", "source", "text")
    val exact = Overlap.exactPairs(docs, k = 2).collect().head
    assert(exact.getLong(2) == 201L && exact.getLong(3) == 201L &&
      exact.getLong(4) == 101L)
    val j = 101.0 / 301.0
    val est = Overlap.estimatePairs(docs, k = 2, perms = 128).collect()
      .head.getDouble(2)
    // stderr = sqrt(J(1-J)/128) ≈ 0.042; allow 3σ on the fixed seed
    assert(math.abs(est - j) < 0.13, s"est $est vs exact $j")
  }
}
