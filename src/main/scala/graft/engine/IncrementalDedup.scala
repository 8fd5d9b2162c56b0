package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (delta) exact dedup: dedup a NEW crawl batch against a
  * persisted digest SNAPSHOT of the corpus already ingested — without
  * re-reading or re-hashing the old corpus. This is the shape a
  * continuously-fed 100 TB corpus actually runs: the reference's
  * whole-corpus scan-then-cascade (Files.pm:215-244 `scan`, fed
  * entirely into one in-memory Engine run) is the bootstrap; every
  * later crawl is a delta against the accumulated digest keys.
  *
  * Contract:
  *   - `snapshot`: (digest, keeper) — ONE row per distinct digest of
  *     the prior corpus with its retained doc id (exactly what
  *     `snapshotDelta` emits; the bootstrap snapshot is
  *     `snapshotDelta(batch, emptySnapshot)` over the initial load).
  *   - batch doc with a digest in the snapshot → duplicate of the
  *     prior keeper (the prior corpus wins — its doc is the one
  *     already retained downstream);
  *   - otherwise duplicate of the batch's own first occurrence
  *     (min id), or novel if it IS the first occurrence.
  *
  * Scale shape: the expensive side is the 10^12-row snapshot; the
  * batch is comparatively small. So the snapshot is probed with ONE
  * scan map-side against the BROADCAST distinct-digest set of the
  * batch (an inner semi-probe whose output — `hits` — is at most
  * |batch digests| rows), and every remaining join in the result is
  * broadcast-sized. The snapshot never shuffles. For batches too big
  * to broadcast, `broadcastBatch = false` degrades to plain
  * shuffle-hash joins on digest (both sides partition once); a
  * digest-bucketed snapshot table makes that shuffle one-sided.
  */
object IncrementalDedup {

  /** Per-batch-row verdicts: (idCol, digest, dup_of, is_novel) where
    * dup_of is null ⟺ is_novel (see object doc for the policy).
    */
  def dedupAgainst(batch: DataFrame, snapshot: DataFrame, idCol: String = "url",
      digest: org.apache.spark.sql.Column = md5(coalesce(col("text"), lit("")).cast("binary")),
      broadcastBatch: Boolean = true): DataFrame = {
    val bd = batch.select(col(idCol).as("id"), digest.as("digest"))
    // intra-batch first occurrence per digest: map-side-combinable min
    val firsts = bd.groupBy("digest").agg(min(col("id")).as("first_id"))
    val probe = if (broadcastBatch) broadcast(firsts.select("digest"))
      else firsts.select("digest")
    // ONE snapshot scan, map-side semi-probe, small output
    val hits = snapshot.join(probe, "digest")
      .select(col("digest"), col("keeper"))
    val hitsB = if (broadcastBatch) broadcast(hits) else hits
    val firstsB = if (broadcastBatch) broadcast(firsts) else firsts
    bd.join(hitsB, Seq("digest"), "left")
      .join(firstsB, Seq("digest"), "left")
      .select(col("id").as(idCol), col("digest"),
        coalesce(col("keeper"),
          when(col("first_id") < col("id"), col("first_id"))).as("dup_of"))
      .withColumn("is_novel", col("dup_of").isNull)
  }

  /** Append-only snapshot update: (digest, keeper) for each digest the
    * batch introduces that the snapshot lacks — union this onto the
    * snapshot table (Iceberg-friendly: pure append, no rewrite of
    * 10^12 existing rows).
    */
  def snapshotDelta(batch: DataFrame, snapshot: DataFrame, idCol: String = "url",
      digest: org.apache.spark.sql.Column = md5(coalesce(col("text"), lit("")).cast("binary")),
      broadcastBatch: Boolean = true): DataFrame = {
    val firsts = batch.select(col(idCol).as("id"), digest.as("digest"))
      .groupBy("digest").agg(min(col("id")).as("keeper"))
    val probe = if (broadcastBatch) broadcast(firsts.select("digest"))
      else firsts.select("digest")
    val hit = snapshot.join(probe, "digest").select("digest")
    val hitB = if (broadcastBatch) broadcast(hit) else hit
    firsts.join(hitB, Seq("digest"), "left_anti")
  }

  /** An empty (digest, keeper) snapshot with `keeper` typed like
    * `idCol` of `like` — the bootstrap input.
    */
  def emptySnapshot(like: DataFrame, idCol: String = "url"): DataFrame =
    like.select(lit("").as("digest"), col(idCol).as("keeper")).limit(0)

  /** Middle path between broadcast and full shuffle: when the batch's
    * digest set is too big for a broadcast hash join but still fits a
    * Bloom filter (a 100M-digest batch at 1% fpp is ~115 MB — fine to
    * broadcast; its exact strings are not), pre-filter the snapshot
    * MAP-SIDE with a Bloom over the batch digests, so only candidate
    * rows (hits + fpp false positives) enter the snapshot-side
    * shuffle of the verdict join. False positives cannot corrupt
    * results — the exact join after the filter discards them; they
    * only cost shuffle rows. Returns the same frame contract as
    * [[dedupAgainst]].
    *
    * Costs: two sizing/sketch passes over the batch (a map-only
    * count — NOT a distinct, which would shuffle the very digest set
    * this path exists to keep off the wire; intra-batch dups merely
    * oversize the ~1.2 B/item sketch — then the bloomFilter
    * aggregate), plus dedupAgainst's own passes. The sketch broadcast
    * lives until the SparkContext's ContextCleaner reclaims it after
    * the returned frame is GC'd — a long-running ingest driver
    * calling this per crawl should let each batch's frames go out of
    * scope promptly (r4c review #3/#4).
    */
  def dedupAgainstBloom(batch: DataFrame, snapshot: DataFrame,
      idCol: String = "url",
      digest: org.apache.spark.sql.Column = md5(coalesce(col("text"), lit("")).cast("binary")),
      fpp: Double = 0.01): DataFrame = {
    val spark = batch.sparkSession
    val bd = batch.select(col(idCol).as("id"), digest.as("digest"))
    val n = math.max(1L, bd.count())
    val bloom = bd.stat.bloomFilter("digest", n, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((d: String) => d != null && bc.value.mightContainString(d))
    dedupAgainst(batch, snapshot.filter(mightContain(col("digest"))),
      idCol, digest, broadcastBatch = false)
  }
}
