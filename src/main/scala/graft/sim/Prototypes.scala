package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prototype-based data pruning (Sorscher et al. 2022, "Beyond neural
  * scaling laws" — SSL-prototypes; composed after [[SemDeDup]] it is
  * Tirumala et al. 2023's D4): rank every document by the cosine to
  * its cluster centroid ("prototypicality") and cut the MOST
  * prototypical `prunePpm` fraction per cluster — the redundant core
  * that SemDeDup's pairwise threshold leaves behind — keeping the
  * hard/diverse tail the scaling-law argument favors when data is
  * abundant. Reference analog: none — [EXT], training-data ops.
  *
  * Determinism contract: proto_micro = round(cosine · 10^6) (the
  * micro discipline — last-ulp double noise between engines/plans is
  * invisible), ties split by the md5(salt:id) order key (the
  * [[graft.corpus.DomainQuota]] fair-shuffle discipline), so the cut
  * is a pure function of (data, centroids, prunePpm, salt) any oracle
  * engine replays.
  *
  * Scale shape: scoring is map-side (vectors meet only BROADCAST
  * centroids — the corpus never shuffles to be scored); cluster sizes
  * are one map-side-combinable count broadcast back; the fractional
  * cut itself is [[graft.corpus.GroupTopK]]'s histogram-staged exact
  * selection — no window ever sorts a whole mega-cluster in one task
  * (prune 20% of a 10^10-doc cluster = a 10^9-row k, where the
  * constant-k two-phase argument stops bounding phase 2).
  */
object Prototypes {

  /** Add `proto_micro` (round(cosine-to-own-centroid · 10^6), long)
    * to an assigned frame. Rows whose cell has no centroid, or with
    * null / zero-norm vectors, score 0 (filterable, never a throw —
    * the [[Ivf.assign]] null contract).
    */
  def score(assigned: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "cell"): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val cent = centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, c.map(x => x * x).sum) }
      .toDF("_cell", "_cv", "_cn")
    Ann.prenorm(assigned, idCol, col(vecCol), "_v", "_nn")
      .join(broadcast(cent), col(cellCol) === col("_cell"), "left")
      .withColumn("proto_micro",
        round(Ann.cosineFromParts(col("_v"), col("_nn"), col("_cv"), col("_cn"))
          * lit(1000000.0)).cast("long"))
      .drop("_cell", "_cv", "_cn", "_v", "_nn")
  }

  /** Per-cluster prototype cut: (idCol, cellCol, proto_micro, kept)
    * for EVERY input row — kept = false for the cluster's top
    * floor(n_cell · prunePpm / 10^6) rows by (proto_micro DESC,
    * md5(salt:id), id). prunePpm = 0 degenerates to a pure scoring
    * pass; null cells form their own capped group.
    */
  def pruneCut(assigned: DataFrame, centroids: Array[Array[Double]],
      prunePpm: Long, idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "cell", salt: String = ""): DataFrame = {
    require(prunePpm >= 0 && prunePpm <= 1000000L,
      s"prunePpm must be in [0, 1000000]: $prunePpm")
    val scored = score(assigned, centroids, idCol, vecCol, cellCol)
      .select(col(idCol), col(cellCol), col("proto_micro"))
    val sizes = scored.groupBy(col(cellCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_k", expr(s"(_n * $prunePpm) div 1000000"))
      .select(col(cellCol).as("_c"), col("_k"))
    val withK = scored
      .join(broadcast(sizes), col(cellCol) <=> col("_c"))
      .drop("_c")
    graft.corpus.GroupTopK.pick(withK, cellCol, "proto_micro", "_k", idCol, salt)
      .withColumn("kept", !col("picked"))
      .select(col(idCol), col(cellCol), col("proto_micro"), col("kept"))
  }

  /** Production composition: IVF k-means assignment (map-side against
    * broadcast centroids) then the prototype cut — D4's second stage
    * on the same trained artifact as [[SemDeDup]]'s first.
    */
  def pruneIvf(corpus: DataFrame, centroids: Array[Array[Double]],
      prunePpm: Long, idCol: String = "vec_id", vecCol: String = "embedding",
      salt: String = ""): DataFrame =
    pruneCut(
      Ivf.assign(corpus, centroids, idCol, vecCol)
        .select(col("id").as(idCol), col("v"), col("cell")),
      centroids, prunePpm, idCol, "v", "cell", salt)
}
