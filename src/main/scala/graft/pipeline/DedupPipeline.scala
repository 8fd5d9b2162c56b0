package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cluster.ConnectedComponents
import graft.engine.{DedupEngine, DedupResult}
import graft.functions.Digests
import graft.near.{MinHashLSH, SimHash}
import graft.report.{Report, Urls}

/** The flagship end-to-end pipeline (north rule): exact content-hash
  * grouping (reference semantics, stage 1) + MinHash/LSH and SimHash
  * near-dup edges + alias (identity) edges → large-star/small-star
  * connected components → cluster assignments.
  *
  * Dataflow (every arrow a narrow, declarative DataFrame transform —
  * Catalyst plans the physical side):
  *
  *   docs ─ quarantine(F4) ─ identity pre-pass(F3) ─┬─ exact cascade (A1) ─ star edges
  *                                                  ├─ MinHash/LSH [EXT] ─ verified edges
  *                                                  └─ SimHash [EXT] ───── verified edges
  *   all edges ∪ alias edges → connected components → (url, cluster_id)
  */
object DedupPipeline {

  case class Config(
      algs: Seq[String] = Seq("filesize", "initial_xxhash", "sha"),
      ignoreEmpty: Boolean = false,
      useMinHash: Boolean = true,
      useSimHash: Boolean = true,
      minhash: MinHashLSH.Config = MinHashLSH.Config(),
      simhash: SimHash.Config = SimHash.Config())

  final class Result(
      val clusters: DataFrame, // (url, cluster_id) — every input url
      val exact: DedupResult,
      val edges: DataFrame, // (src, dst, kind)
      val quarantined: DataFrame,
      docsInThunk: () => Long,
      skippedThunk: () => Map[String, Long] = () => Map.empty) {
    lazy val docsIn: Long = docsInThunk()
    lazy val quarantinedCount: Long = quarantined.count()
    /** Rows dropped by over-cap LSH/SimHash buckets (SCALE.md
      * invariant 3: capped AND surfaced, never silent).
      */
    lazy val skippedBucketRows: Map[String, Long] = skippedThunk()
    /** duplicates-only tab report over final clusters (reference P2). */
    lazy val report: DataFrame = Report.duplicateReport(
      clusters.groupBy("cluster_id").agg(sort_array(collect_list(col("url"))).as("members")))
    lazy val summary: DataFrame = Report.summary(
      clusters.groupBy("cluster_id").agg(collect_list(col("url")).as("members")))
  }

  def run(docsRaw: DataFrame, cfg: Config = Config()): Result = {
    // F4 quarantine: undecodable rows (text null) are counted and routed
    // out, never silently dropped (Files.pm:229-233, Files.t:290-299)
    val quarantined = docsRaw.filter(col("text").isNull)
    val valid0 = docsRaw.filter(col("text").isNotNull)
    val valid = if (cfg.ignoreEmpty) valid0.filter(octet_length(col("html")) > 0) else valid0

    // F3 identity pre-pass: one canonical row per normalized url;
    // alias edges keep the dropped members clustered with the canonical.
    // Not persisted: canon is a cheap broadcast-anti-join over the
    // source scan — caching full pages would not survive 100 TB.
    val canon = Report.dedupIdentity(valid)
    val aliasEdges = valid
      .select(Urls.normalize(col("url")).as("identity"), col("url"))
      .withColumn("canonical", min(col("url")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("identity"))))
      .filter(col("url") =!= col("canonical"))
      .select(col("url").as("src"), col("canonical").as("dst"), lit("alias").as("kind"))

    // stage 1: exact content-hash cascade (reference semantics)
    val exact = DedupEngine.run(canon, "url", Digests.cascade(col("html"), cfg.algs))
    val exactEdges = exact.assignments
      .filter(col("id") =!= col("block_id"))
      .select(col("id").as("src"), col("block_id").as("dst"), lit("exact").as("kind"))

    // [EXT] near-dup stages over non-empty canonical text. ONE
    // shingling/signature pass feeds MinHash banding, verification,
    // SimHash fingerprints and the skip metric (tokenize+hash is the
    // dominant map-side cost — r01 paid it twice per page).
    val textDocs = canon.filter(trim(col("text")) =!= "")
    lazy val sigs = MinHashLSH.signatures(textDocs, cfg.minhash).persist()
    val mh =
      if (cfg.useMinHash)
        MinHashLSH.edgesFromSignatures(sigs, cfg.minhash)
          .withColumn("kind", lit("minhash")).drop("jaccard")
      else null
    val sh =
      if (cfg.useSimHash)
        SimHash.edgesFromFingerprints(
          SimHash.fingerprintsFromShingles(
            if (cfg.useMinHash) sigs
            else MinHashLSH.signatures(textDocs,
              cfg.minhash.copy(shingleK = cfg.simhash.shingleK)),
            cfg.simhash), cfg.simhash)
          .withColumn("kind", lit("simhash")).drop("hamming")
      else null

    val allEdges = Seq(Option(aliasEdges), Option(exactEdges), Option(mh), Option(sh))
      .flatten.map(_.select("src", "dst", "kind")).reduce(_ unionByName _)

    // [EXT] connected components; singletons keep their own id
    val cc = ConnectedComponents.run(allEdges.select("src", "dst"))
    val clusters = valid.select(col("url"))
      .join(cc, valid("url") === cc("id"), "left")
      .select(col("url"), coalesce(col("component"), col("url")).as("cluster_id"))

    def skipped(): Map[String, Long] = {
      def total(df: DataFrame): Long =
        df.agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0)
      (if (cfg.useMinHash)
        Map("minhash" -> total(MinHashLSH.skippedBucketRows(sigs, cfg.minhash)))
      else Map.empty[String, Long]) ++
        (if (cfg.useSimHash)
          Map("simhash" -> total(SimHash.skippedBucketRows(textDocs, cfg.simhash)))
        else Map.empty[String, Long])
    }
    new Result(clusters, exact, allEdges, quarantined, () => docsRaw.count(), skipped _)
  }

  /** Checkpointed variant (north rule: every stage materializes with
    * lineage so the pipeline resumes mid-run without recompute). The
    * edge set and the final clusters are staged through the Catalog;
    * a re-run with the same config + input lineage reads the tables
    * back instead of recomputing, and per-stage row/partition metrics
    * land in the catalog's metrics table (S5/S6).
    */
  def runCheckpointed(docsRaw: DataFrame, catalog: graft.checkpoint.Catalog,
      cfg: Config = Config(), inputLineage: String = ""): Result = {
    val base = s"$inputLineage|algs=${cfg.algs.mkString(",")}|ie=${cfg.ignoreEmpty}" +
      s"|mh=${cfg.useMinHash}:${cfg.minhash}|sh=${cfg.useSimHash}:${cfg.simhash}"

    val quarantined = docsRaw.filter(col("text").isNull)
    val valid0 = docsRaw.filter(col("text").isNotNull)
    val valid = if (cfg.ignoreEmpty) valid0.filter(octet_length(col("html")) > 0) else valid0
    val canon = Report.dedupIdentity(valid)
    lazy val exact = DedupEngine.run(canon, "url", Digests.cascade(col("html"), cfg.algs))

    // stage 1: the full edge set (alias + exact + near-dup edges);
    // resume skips digesting/shingling the corpus entirely
    val edges = catalog.stage("edges", base) {
      val aliasEdges = valid
        .select(Urls.normalize(col("url")).as("identity"), col("url"))
        .withColumn("canonical", min(col("url")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("identity"))))
        .filter(col("url") =!= col("canonical"))
        .select(col("url").as("src"), col("canonical").as("dst"), lit("alias").as("kind"))
      val exactEdges = exact.assignments
        .filter(col("id") =!= col("block_id"))
        .select(col("id").as("src"), col("block_id").as("dst"), lit("exact").as("kind"))
      val textDocs = canon.filter(trim(col("text")) =!= "")
      lazy val sigs = MinHashLSH.signatures(textDocs, cfg.minhash).persist()
      val mh = if (cfg.useMinHash)
        Some(MinHashLSH.edgesFromSignatures(sigs, cfg.minhash)
          .withColumn("kind", lit("minhash")).drop("jaccard")) else None
      val sh = if (cfg.useSimHash)
        Some(SimHash.edgesFromFingerprints(
          SimHash.fingerprintsFromShingles(
            if (cfg.useMinHash) sigs
            else MinHashLSH.signatures(textDocs,
              cfg.minhash.copy(shingleK = cfg.simhash.shingleK)),
            cfg.simhash), cfg.simhash)
          .withColumn("kind", lit("simhash")).drop("hamming")) else None
      (Seq(Some(aliasEdges), Some(exactEdges), mh, sh).flatten
        .map(_.select("src", "dst", "kind"))).reduce(_ unionByName _)
    }

    // stage 2: connected components over the staged edges
    val clusters = catalog.stage("clusters", base + "|edges") {
      val cc = ConnectedComponents.run(edges.select("src", "dst"))
      valid.select(col("url"))
        .join(cc, valid("url") === cc("id"), "left")
        .select(col("url"), coalesce(col("component"), col("url")).as("cluster_id"))
    }
    // surface over-cap skip counts alongside the stage metrics (SCALE
    // invariant 3: capped AND surfaced)
    def skipped(): Map[String, Long] = {
      val textDocs = canon.filter(trim(col("text")) =!= "")
      def total(df: DataFrame): Long =
        df.agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0)
      (if (cfg.useMinHash)
        Map("minhash" -> total(MinHashLSH.skippedBucketRows(
          MinHashLSH.signatures(textDocs, cfg.minhash), cfg.minhash)))
      else Map.empty[String, Long]) ++
        (if (cfg.useSimHash)
          Map("simhash" -> total(SimHash.skippedBucketRows(textDocs, cfg.simhash)))
        else Map.empty[String, Long])
    }
    val skippedCounts = skipped()
    catalog.recordMetrics("clusters", Map(
      "clusters" -> clusters.select(col("cluster_id")).distinct().count(),
      "edges" -> edges.count()) ++
      skippedCounts.map { case (k, v) => s"skipped_bucket_rows_$k" -> v })
    new Result(clusters, exact, edges, quarantined, () => docsRaw.count(),
      () => skippedCounts)
  }
}
