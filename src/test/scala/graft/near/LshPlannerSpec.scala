package graft.near

import org.scalatest.funsuite.AnyFunSuite

/** Pure driver-side arithmetic — no SparkSession needed. */
class LshPlannerSpec extends AnyFunSuite {

  test("S-curve: bounded, monotone in s, endpoints exact") {
    for ((b, r) <- Seq((32, 4), (16, 8), (8, 16), (1, 128), (128, 1))) {
      assert(LshPlanner.collisionProb(0.0, b, r) == 0.0)
      assert(math.abs(LshPlanner.collisionProb(1.0, b, r) - 1.0) < 1e-12)
      val ps = (0 to 100).map(i => LshPlanner.collisionProb(i / 100.0, b, r))
      assert(ps.sliding(2).forall(w => w(1) >= w(0) - 1e-12), s"non-monotone at b=$b r=$r")
    }
  }

  test("curve midpoint sits where collision probability turns on") {
    for ((b, r) <- Seq((32, 4), (16, 8), (64, 2))) {
      val m = LshPlanner.curveMidpoint(b, r)
      val pm = LshPlanner.collisionProb(m, b, r)
      assert(pm > 0.5 && pm < 0.75, s"P(mid)=$pm at b=$b r=$r") // -> 1-1/e for large b
      assert(LshPlanner.collisionProb(m * 0.7, b, r) < pm)
      assert(LshPlanner.collisionProb(math.min(1.0, m * 1.3), b, r) > pm)
    }
  }

  test("optimalParams: feasible, beats the default banding at its own midpoint") {
    val (b, r) = LshPlanner.optimalParams(128, 0.7)
    assert(b >= 1 && r >= 1 && b * r <= 128)
    // exhaustive search ⇒ no other feasible pair may do better
    val err = LshPlanner.error(0.7, b, r)
    for ((ob, or) <- Seq((32, 4), (16, 8), (64, 2), (8, 16)))
      assert(err <= LshPlanner.error(0.7, ob, or) + 1e-12, s"beaten by ($ob,$or)")
  }

  test("higher threshold pushes toward more rows per band (steeper, later curve)") {
    val (bl, rl) = LshPlanner.optimalParams(128, 0.3)
    val (bh, rh) = LshPlanner.optimalParams(128, 0.9)
    assert(rh > rl)
    // chosen curves put their midpoint near their own threshold
    assert(math.abs(LshPlanner.curveMidpoint(bl, rl) - 0.3) < 0.15)
    assert(math.abs(LshPlanner.curveMidpoint(bh, rh) - 0.9) < 0.15)
  }

  test("recall-weighted planning chooses at least as many bands (catch more)") {
    val recallFirst = LshPlanner.configFor(0.7, 128, fpWeight = 0.1, fnWeight = 0.9)
    val precisionFirst = LshPlanner.configFor(0.7, 128, fpWeight = 0.9, fnWeight = 0.1)
    assert(recallFirst.bands >= precisionFirst.bands)
    // more bands ⇒ the curve turns on earlier ⇒ fewer misses above t
    assert(LshPlanner.falseNegativeArea(0.7, recallFirst.bands, 128 / recallFirst.bands)
      <= LshPlanner.falseNegativeArea(0.7, precisionFirst.bands, 128 / precisionFirst.bands) + 1e-12)
  }

  test("configFor: bands divide numPerms and carry the threshold; beats the ship default at t=0.42") {
    val cfg = LshPlanner.configFor(0.42, 128)
    assert(128 % cfg.bands == 0)
    assert(cfg.jaccardThreshold == 0.42)
    // the ship default (32 bands × 4 rows) has midpoint (1/32)^(1/4) ≈ 0.42:
    // the planner may only match or beat it on its own home ground
    assert(LshPlanner.error(0.42, cfg.bands, 128 / cfg.bands)
      <= LshPlanner.error(0.42, 32, 4) + 1e-12)
  }
}
