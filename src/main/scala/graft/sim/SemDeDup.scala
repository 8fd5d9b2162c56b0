package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
  * deduplication over an embedding column — k-means-cluster the
  * embedding space, call two documents semantic duplicates when their
  * cosine similarity clears a threshold WITHIN a cluster, keep one
  * representative per duplicate group. The web-scale motivation is the
  * same as the reference's blocking cascade (Theory.pod's
  * never-all-pairs discipline): the cluster assignment is the cheap
  * blocking key, exact cosine the expensive verify.
  *
  * Re-expressed on this repo's existing kernels:
  *   - the IVF coarse quantizer ([[Ivf.train]]/[[Ivf.assign]]) IS the
  *     k-means clustering — assignment runs map-side against broadcast
  *     centroids, so the corpus never shuffles for clustering;
  *   - within-cell pairing streams through the bounded
  *     [[graft.functions.CappedGroups]] drain: a 2..maxCell cell emits
  *     its pairs, an over-cap cell emits ONE counted skip row — capped
  *     AND surfaced in the same pass (SCALE.md invariant 3), with the
  *     opt-in salted two-round drain for a corpus-dominating cell;
  *   - exact cosine verify joins vectors onto the (small) candidate
  *     set only — vectors never ride the candidate shuffle.
  *
  * Differs from [[Ann.embeddingDupEdges]]'s banded hyperplane LSH in
  * being DATA-ADAPTIVE: one density-following partition instead of T
  * random tables — fewer shuffled candidate rows on clustered real
  * embeddings, at the cost of a (bounded, one-off) training pass and
  * of misses across cell boundaries, which is SemDeDup's own published
  * approximation (its dedup operates strictly within clusters).
  */
object SemDeDup {

  /** Within-cell semantic-duplicate edges + skip rows in one candidate
    * pass: verified (src, dst, score, skipped = 0) pairs with cosine ≥
    * `threshold`, plus at most one aggregated (null, null, null, n)
    * row counting members of over-cap cells (the
    * [[Ann.embeddingDupEdgesAndSkips]] fused-skip contract). Pair
    * orientation follows the ORIGINAL id type's ordering.
    */
  def edgesAndSkips(corpus: DataFrame, centroids: Array[Array[Double]],
      threshold: Double, idCol: String = "vec_id", vecCol: String = "embedding",
      maxCell: Int = 4096, salts: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cap = maxCell
    def emit(n: Long, ids0: collection.IndexedSeq[String]): Iterator[(String, String, Long)] =
      if (n > cap) Iterator.single((null: String, null: String, n))
      else if (ids0.length < 2) Iterator.empty
      else {
        val ids = ids0.sorted
        for {
          i <- ids.indices.iterator
          j <- ((i + 1) until ids.length).iterator
        } yield (ids(i), ids(j), 0L)
      }
    // ONE argmax pass (k·dim per row against broadcast centroids);
    // only (id, cell) rides the candidate shuffle
    val rows = Ivf.assign(corpus, centroids, idCol, vecCol)
      .select(col("id").cast("string").as("id"), col("cell"))
      .as[(String, Int)]
    val raw =
      if (salts > 1)
        graft.functions.CappedGroups.saltedDrain[Int, String, (String, String, Long)](
          rows.map(r => (r._2, r._1)), cap, salts,
          id => scala.util.hashing.MurmurHash3.stringHash(id),
          (_, n, ids) => emit(n, ids))
      else rows
        .groupByKey(_._2)
        .flatMapGroups { (_, rs) =>
          val (n, ids0) = graft.functions.CappedGroups.drain(rs.map(_._1), cap)
          emit(n, ids0)
        }
    // cells partition the corpus, so (src, dst) pairs are already
    // distinct; the groupBy exists to collapse every over-cap cell's
    // skip row into one summed row in the same small shuffle
    val fused = raw.toDF("src", "dst", "skipped")
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("skipped")).as("skipped"))
    // verify joins vectors (prenormed, NO second argmax pass) onto the
    // candidate set only; LEFT joins pass the skip row through
    val pre = Ann.prenorm(corpus.select(col(idCol).as("id0"), col(vecCol).as("v0")),
      "id0", col("v0"), "v", "nn").drop("v0")
      .withColumn("ids", col("id0").cast("string"))
    fused
      .join(pre.select(col("ids").as("src"), col("id0").as("src_id"),
        col("v").as("sv"), col("nn").as("sn")), Seq("src"), "left")
      .join(pre.select(col("ids").as("dst"), col("id0").as("dst_id"),
        col("v").as("dv"), col("nn").as("dn")), Seq("dst"), "left")
      .withColumn("score", when(col("src").isNotNull,
        round(Ann.cosineFromParts(col("sv"), col("sn"), col("dv"), col("dn")), 6)))
      .filter(col("src").isNull || col("score") >= threshold)
      .select(least(col("src_id"), col("dst_id")).as("src"),
        greatest(col("src_id"), col("dst_id")).as("dst"), col("score"),
        col("skipped"))
  }

  /** Pairs-only view of [[edgesAndSkips]]: (src, dst, score). */
  def edges(corpus: DataFrame, centroids: Array[Array[Double]], threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCell: Int = 4096, salts: Int = 1): DataFrame =
    edgesAndSkips(corpus, centroids, threshold, idCol, vecCol, maxCell, salts)
      .filter(col("src").isNotNull)
      .select("src", "dst", "score")

  /** SemDeDup's keep-one policy: (id, keep_id) for EVERY corpus id —
    * the representative of the semantic-duplicate group (connected
    * components over the edge set, so chains a~b~c collapse even when
    * a~c itself misses the threshold — the published policy prunes all
    * but one per group). Docs with no semantic dup keep themselves.
    * Group representatives are minima of the ids' STRING form (the
    * [[graft.cluster.ConnectedComponents]] label domain) — fixed-width
    * ids (lpad) make that order match the natural one.
    */
  def keepers(corpus: DataFrame, centroids: Array[Array[Double]], threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCell: Int = 4096, salts: Int = 1): DataFrame = {
    val e = edges(corpus, centroids, threshold, idCol, vecCol, maxCell, salts)
      .select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
    val cc = graft.cluster.ConnectedComponents.run(e)
      .select(col("id").as("ids"), col("component"))
    corpus.select(col(idCol).as("id"), col(idCol).cast("string").as("ids"))
      .join(cc, Seq("ids"), "left")
      .select(col("id"), coalesce(col("component"), col("ids")).as("keep_id"))
  }
}
