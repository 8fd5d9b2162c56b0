package graft.near

import org.scalatest.funsuite.AnyFunSuite

class BbitSpec extends AnyFunSuite {

  test("pack/extract roundtrip across word boundaries for every packing width") {
    val rnd = new scala.util.Random(7)
    val sig = Array.fill(128)(rnd.nextLong())
    for (b <- Seq(1, 2, 3, 7, 13, 32)) {
      val packed = Hashing.bbitPack(sig, b)
      assert(packed.length == (128 * b + 63) / 64)
      val mask = (1L << b) - 1
      for (i <- sig.indices)
        assert(Hashing.bbitAt(packed, i, b) == (sig(i) & mask), s"b=$b i=$i")
    }
    intercept[IllegalArgumentException] { Hashing.bbitPack(sig, 0) }
  }

  test("word-wise fast path equals per-component extraction at every power-of-two width") {
    val rnd = new scala.util.Random(3)
    for (b <- Seq(1, 2, 4, 8, 16, 32); n <- Seq(7, 100, 128)) {
      val sa = Array.fill(n)(rnd.nextLong())
      // plant agreements so the count is neither 0 nor n
      val sb = sa.zipWithIndex.map { case (v, i) =>
        if (i % 3 == 0) v else rnd.nextLong()
      }
      val pa = Hashing.bbitPack(sa, b)
      val pb = Hashing.bbitPack(sb, b)
      val ref = (0 until n).count(i =>
        Hashing.bbitAt(pa, i, b) == Hashing.bbitAt(pb, i, b))
      assert(Hashing.bbitMatches(pa, pb, n, b) == ref, s"b=$b n=$n")
    }
    // PREFIX compare: sketches packed from 128 perms, compared over
    // the first n only — real differing components past n live in the
    // last word and must be masked out, not counted as mismatches
    for (b <- Seq(1, 2, 4, 8); n <- Seq(100, 96, 31)) {
      val sa = Array.fill(128)(rnd.nextLong())
      val sb = sa.zipWithIndex.map { case (v, i) =>
        if (i % 3 == 0) v else rnd.nextLong()
      }
      val pa = Hashing.bbitPack(sa, b)
      val pb = Hashing.bbitPack(sb, b)
      val ref = (0 until n).count(i =>
        Hashing.bbitAt(pa, i, b) == Hashing.bbitAt(pb, i, b))
      assert(Hashing.bbitMatches(pa, pb, n, b) == ref, s"prefix b=$b n=$n")
    }
    // a non-power width exercises the extraction fallback
    val sa = Array.fill(50)(rnd.nextLong())
    val sb = Array.fill(50)(rnd.nextLong())
    val pa = Hashing.bbitPack(sa, 3)
    val pb = Hashing.bbitPack(sb, 3)
    val ref = (0 until 50).count(i =>
      Hashing.bbitAt(pa, i, 3) == Hashing.bbitAt(pb, i, 3))
    assert(Hashing.bbitMatches(pa, pb, 50, 3) == ref)
    // b=0 passes the power-of-two test but would spin the lsb-mask
    // loop forever — rejected up front, mirroring bbitPack's domain
    intercept[IllegalArgumentException] {
      Hashing.bbitMatches(pa, pb, 50, 0)
    }
  }

  test("matches and estimator: identity, chance floor, clamp") {
    val rnd = new scala.util.Random(11)
    val sig = Array.fill(128)(rnd.nextLong())
    val p = Hashing.bbitPack(sig, 2)
    assert(Hashing.bbitMatches(p, p, 128, 2) == 128)
    assert(Hashing.bbitEstimate(128, 128, 2) == 1.0)
    // chance-level agreement (m = n/2^b) estimates exactly 0, and
    // anything below chance clamps to 0 rather than going negative
    assert(Hashing.bbitEstimate(32, 128, 2) == 0.0)
    assert(Hashing.bbitEstimate(10, 128, 2) == 0.0)
  }

  test("b=2 sketch estimates Jaccard on real signatures within its stderr band") {
    // two shingle sets with exact Jaccard 60/(90+90-60) = 0.5
    val shared = (0 until 60).map(i => s"shared token run number $i")
    val a = Hashing.shingleHashes(
      (shared ++ (0 until 30).map(i => s"only in document alpha $i")).toArray, 1)
    val b = Hashing.shingleHashes(
      (shared ++ (0 until 30).map(i => s"only in document beta $i")).toArray, 1)
    val exact = Hashing.jaccard(a, b)
    assert(math.abs(exact - 0.5) < 1e-9)
    val sa = Hashing.minhash(a, 128, seed = 42L)
    val sb = Hashing.minhash(b, 128, seed = 42L)
    val full = Hashing.sigEstimate(sa, sb)
    val m = Hashing.bbitMatches(Hashing.bbitPack(sa, 2), Hashing.bbitPack(sb, 2), 128, 2)
    val est = Hashing.bbitEstimate(m, 128, 2)
    // b-bit stderr at n=128, b=2, J=0.5 is ~0.06; allow 3 sigma, and
    // the estimate must agree with the full-width estimator it is a
    // compression of (deterministic given the fixed seed)
    assert(math.abs(est - exact) < 0.18, s"est=$est exact=$exact")
    assert(math.abs(full - exact) < 0.13, s"full=$full")
    assert(m >= Hashing.sigEstimate(sa, sb) * 128 - 1e-9,
      "a full-width match is always a b-bit match")
  }
}
