package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/validation/test splitting — the eval-hygiene
  * twin of decontamination (GPT-3 appendix C measures leakage AFTER
  * the fact; this prevents it at split time): a held-out set is only
  * honest if no duplicate of a training document sits in it, so the
  * split is assigned per GROUP (exact-dup fingerprint, or near-dup
  * cluster component), never per document.
  *
  * Mechanism: a group key hashes to a u32 bucket (first 8 hex chars of
  * md5(salt || key)); cumulative-fraction INTEGER thresholds over
  * [0, 2^32) pick the split. Deterministic in (key, salt) — re-runs,
  * late-arriving shards, and engines agree byte-for-byte (every
  * primitive has identical semantics in DuckDB, the repo's oracle
  * contract) — and entirely map-side: the fingerprint form adds ZERO
  * shuffles to a 10^12-row corpus because the group key is computed
  * from the row itself. Float thresholds are avoided on purpose:
  * comparing exact integers sidesteps last-ulp disagreement between
  * engines (BASELINE.md's decimal→double lesson).
  */
object Splits {

  /** u32 bucket of a group key under a salt: uniform in [0, 2^32). */
  def bucket(key: Column, salt: String): Column =
    graft.functions.Hashing.hexPrefixLong(concat(lit(salt), key).cast("binary"), 8)

  /** Integer thresholds for cumulative fractions: floor(cum · 2^32).
    * Exposed so tests and oracle SQL share the exact boundary values.
    */
  def thresholds(fracs: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(fracs.nonEmpty, "at least one split required")
    require(fracs.forall(_._2 > 0.0), s"fractions must be positive: $fracs")
    val sum = fracs.map(_._2).sum
    require(math.abs(sum - 1.0) < 1e-9, s"fractions must sum to 1, got $sum")
    val cums = fracs.map(_._2).scanLeft(0.0)(_ + _).tail
    fracs.map(_._1).zip(cums.map(c => math.min((c * 4294967296.0).toLong, 4294967296L)))
  }

  /** Split-name Column for a group key: the bucket falls into the
    * first cumulative-threshold interval. The LAST split absorbs the
    * rounding remainder (its threshold is 2^32 exactly).
    */
  def splitColumn(key: Column, fracs: Seq[(String, Double)],
      salt: String = "graft"): Column = {
    val ts = thresholds(fracs)
    val b = bucket(key, salt)
    ts.init.foldRight(lit(ts.last._1): Column) { case ((name, t), rest) =>
      when(b < t, lit(name)).otherwise(rest)
    }
  }

  /** Exact-dup-safe split: groups = normalized-text fingerprints
    * ([[graft.text.TextStats.fingerprintMd5]]), so byte-near-identical
    * documents can never straddle a split boundary. Map-only — no
    * shuffle, no state; the assignment is reproducible from the row
    * alone (a re-crawled duplicate in NEXT month's batch lands in the
    * same split).
    */
  def byFingerprint(docs: DataFrame, textCol: String = "text",
      fracs: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      salt: String = "graft", as: String = "split"): DataFrame =
    docs.withColumn(as,
      splitColumn(graft.text.TextStats.fingerprintMd5(col(textCol)), fracs, salt))

  /** Cluster-grain split: groups = a standing (id, component)
    * assignment (near-dup clusters from the pipeline, or the
    * incremental [[graft.cluster.IncrementalCC]] table), so NEAR-dups
    * never straddle the boundary either. One join against the
    * assignment — broadcast it when it fits, else it shuffles on id
    * (the corpus side arrives already keyed). Ids absent from the
    * assignment are their own singleton group (hash of the id itself).
    */
  def byAssignment(docs: DataFrame, assignment: DataFrame,
      idCol: String = "url",
      fracs: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      salt: String = "graft", as: String = "split"): DataFrame =
    docs
      .join(assignment.select(col("id").as(idCol), col("component")), Seq(idCol), "left")
      .withColumn(as, splitColumn(
        coalesce(col("component"), col(idCol).cast("string")), fracs, salt))
      .drop("component")
}
