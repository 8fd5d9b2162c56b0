package graft.near

/** LSH banding parameter planner [EXT]: choose (bands b, rows r) to
  * match a target Jaccard threshold, minimizing the weighted
  * false-positive + false-negative AREA of the banding S-curve
  * P(s) = 1 − (1 − s^r)^b — the standard construction (Leskovec/
  * Rajaraman/Ullman, "Mining of Massive Datasets" §3.4.3; the same
  * objective the public datasketch library searches). Reference
  * semantics analog: the cascade's cheap-to-expensive key ladder
  * (Engine.pm's digest cascade) tunes work to confidence — this tunes
  * the near-dup tier's candidate volume to the threshold.
  *
  * Everything here is driver-side closed-form arithmetic over at most
  * numPerms·steps terms — no Spark jobs, no data. At 10^12 docs the
  * parameter choice is THE cost lever: a band too many multiplies the
  * shuffled candidate volume corpus-wide, a row too many silently
  * drops true pairs (recall ≥ 0.99 is the north rule's bar).
  */
object LshPlanner {

  /** P(pair becomes a candidate | Jaccard = s) under b bands × r rows. */
  def collisionProb(s: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** The similarity where the S-curve crosses ~1/2: (1/b)^(1/r). */
  def curveMidpoint(b: Int, r: Int): Double = math.pow(1.0 / b, 1.0 / r)

  /** Midpoint-rule integral of P(s) over s ∈ [0, threshold): expected
    * candidate mass from BELOW-threshold pairs (false positives,
    * relative to a uniform similarity density).
    */
  def falsePositiveArea(threshold: Double, b: Int, r: Int, steps: Int = 200): Double = {
    val dx = threshold / steps
    var acc = 0.0
    var i = 0
    while (i < steps) { acc += collisionProb((i + 0.5) * dx, b, r) * dx; i += 1 }
    acc
  }

  /** Midpoint-rule integral of 1 − P(s) over s ∈ (threshold, 1]:
    * missed mass from ABOVE-threshold pairs (false negatives).
    */
  def falseNegativeArea(threshold: Double, b: Int, r: Int, steps: Int = 200): Double = {
    val dx = (1.0 - threshold) / steps
    var acc = 0.0
    var i = 0
    while (i < steps) { acc += (1.0 - collisionProb(threshold + (i + 0.5) * dx, b, r)) * dx; i += 1 }
    acc
  }

  /** Weighted planner objective. */
  def error(threshold: Double, b: Int, r: Int,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): Double =
    fpWeight * falsePositiveArea(threshold, b, r) +
      fnWeight * falseNegativeArea(threshold, b, r)

  /** Globally optimal (bands, rows) over EVERY pair with b·r ≤
    * numPerms (exhaustive — the space is tiny). Ties break toward
    * fewer bands: each band is one shuffled (band_id, band_hash, id)
    * row per doc, so fewer bands = less candidate-generation traffic.
    */
  def optimalParams(numPerms: Int, threshold: Double,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): (Int, Int) = {
    require(numPerms >= 2, s"numPerms=$numPerms")
    require(threshold > 0.0 && threshold < 1.0, s"threshold=$threshold")
    val cands = for {
      r <- 1 to numPerms
      b <- 1 to numPerms / r
    } yield (error(threshold, b, r, fpWeight, fnWeight), b, r)
    val best = cands.minBy(c => (c._1, c._2))
    (best._2, best._3)
  }

  /** Optimal [[MinHashLSH.Config]] for a threshold: like
    * [[optimalParams]] but restricted to divisor bandings b·r =
    * numPerms (the signature is sliced into contiguous bands of
    * numPerms/bands rows — [[MinHashLSH.bandHashesLocal]]), carrying
    * the threshold into the verify stage.
    */
  def configFor(threshold: Double, numPerms: Int = 128,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5,
      base: MinHashLSH.Config = MinHashLSH.Config()): MinHashLSH.Config = {
    val divisorPairs = (1 to numPerms).filter(numPerms % _ == 0)
      .map(b => (error(threshold, b, numPerms / b, fpWeight, fnWeight), b))
    val bands = divisorPairs.minBy(c => (c._1, c._2))._2
    base.copy(numPerms = numPerms, bands = bands, jaccardThreshold = threshold)
  }
}
