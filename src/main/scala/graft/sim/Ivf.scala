package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the k-means
  * coarse-quantizer scale path (the FAISS IVF-flat design, re-expressed
  * as Spark dataflow): train centroids over normalized directions,
  * assign every corpus vector to its nearest centroid map-side
  * (inverted lists = a `cell` column, i.e. a partitionable key — no
  * index structure to build or ship), probe the `nprobe` nearest cells
  * per query, exact re-rank within the probed lists.
  *
  * Complements the banded hyperplane LSH (`Ann`): IVF adapts to the
  * DATA distribution (cells follow density; good for clustered real
  * embeddings), LSH is data-independent (no training pass, stable
  * under distribution drift). Both keep the scan per query at
  * ~(probed fraction)·N.
  *
  * Scale notes: training runs on a deterministic hash-sample (bounded
  * rows) as distributed aggregations — the driver only ever holds
  * k×dim centroid doubles; assignment and search are map-side against
  * broadcast centroids; the only shuffles are the per-cell count
  * aggregation (diagnostics) and the top-k window over scored
  * candidates. Centroid averages are floating-point sums over
  * unordered partitions — run-to-run ulp drift is possible, so cell
  * ids are NOT stable across retrainings; within one trained model
  * every assignment is a pure function of (vector, centroids).
  */
object Ivf {

  /** Unit-normalize (double precision); null/zero-norm → null. */
  private val normUdf = udf((v: Seq[Float]) =>
    if (v == null || v.isEmpty) null
    else {
      var n = 0.0
      var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
      if (n <= 0) null
      else {
        val s = 1.0 / math.sqrt(n)
        val out = new Array[Double](v.length)
        i = 0
        while (i < v.length) { out(i) = v(i) * s; i += 1 }
        out
      }
    })

  private def argmaxCell(cs: Array[Array[Double]], v: Seq[Double]): Int =
    argmaxArr(cs, v.toArray)

  private def argmaxArr(cs: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      var d = 0.0; var i = 0
      val n = math.min(cv.length, v.length)
      while (i < n) { d += cv(i) * v(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c } // ties → lowest index
      c += 1
    }
    best
  }

  /** Train k spherical-k-means centroids on a deterministic,
    * BOUNDED hash-sample: one Spark job collects the `maxSample`
    * vectors with smallest xxhash64(id) (further thinned by
    * `sampleMod` when the corpus is huge — size it so ~100·k rows
    * survive), then Lloyd rounds run in-driver over the sample array.
    * Training on a bounded sample is the standard coarse-quantizer
    * recipe (FAISS trains IVF on ≤ a few hundred k vectors regardless
    * of corpus size); the driver holds maxSample·dim doubles — a model
    * artifact, not the data path (SCALE.md invariant 4: assignment and
    * search remain fully distributed). One job instead of one per
    * Lloyd round — per-round Spark actions were pure scheduling
    * overhead at every scale, since the sample is bounded anyway.
    *
    * Determinism: the sample, its order, the init (first k of it) and
    * the in-driver float summation order are all fixed → identical
    * centroids for identical input.
    */
  def train(corpus: DataFrame, k: Int, iters: Int = 5, sampleMod: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxSample: Int = 65536): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
      .select(xxhash64(col(idCol)).as("h"), col(idCol).as("id"), normUdf(col(vecCol)).as("nv"))
      .filter(col("nv").isNotNull)
      .orderBy(col("h"), col("id"))
      .limit(maxSample)
      .select(col("nv"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length > 0, "IVF training sample is empty")
    val kk = math.min(k, sample.length)
    var centroids = sample.take(kk).map(_.clone())
    val dim = centroids(0).length
    for (_ <- 1 to iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        val c = argmaxArr(centroids, v)
        val s = sums(c)
        var d = 0
        while (d < dim) { s(d) += v(d); d += 1 }
        counts(c) += 1
        i += 1
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else {
          val m = sums(c)
          val n = math.sqrt(m.map(x => x * x).sum)
          if (n > 0) m.map(_ / n) else centroids(c)
        }
      }
    }
    centroids
  }

  /** Train-once/resume centroids as a Catalog MODEL ARTIFACT (r3
    * VERDICT #7): the trained coarse quantizer is staged as a
    * (cell, centroid) table under the stage-lineage contract — a
    * resumed run whose input lineage + training config are unchanged
    * READS THE CENTROIDS BACK instead of retraining, so cell ids stay
    * stable across runs (they are NOT stable across retrainings —
    * float summation order makes centroids run-specific, which is
    * exactly why the artifact, not the recipe, must persist).
    */
  def trainCheckpointed(corpus: DataFrame, catalog: graft.checkpoint.Catalog,
      name: String, inputLineage: String, k: Int, iters: Int = 5, sampleMod: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxSample: Int = 65536): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val lineage =
      s"$inputLineage|ivf:k=$k|iters=$iters|mod=$sampleMod|id=$idCol|vec=$vecCol|max=$maxSample"
    val df = catalog.stage(name, lineage) {
      train(corpus, k, iters, sampleMod, idCol, vecCol, maxSample)
        .zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
    }
    df.orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
  }

  /** (cell, id, original columns…) — map-side assignment against the
    * broadcast centroids; the inverted "lists" are just this keyed
    * frame (bucket/partition by `cell` to co-locate them).
    */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cs = centroids
    // normalize + argmax FUSED in one nullable-Integer UDF: the previous
    // withColumn("nv", normUdf0(v)).filter(nv.isNotNull).withColumn(
    // "cell", cellU(nv)) shape let predicate pushdown rewrite the filter
    // to filter(normUdf0(v).isNotNull) BELOW the collapsed project that
    // recomputed normUdf0(v) for the argmax — every vector normalized
    // (and allocated) twice on the hot assignment path (ADVICE r4 #2).
    // Null / zero-norm embeddings yield a null cell and are filtered
    // (same semantics as the r3 fix; arithmetic identical to
    // normUdf0-then-argmaxCell, so cell ids are unchanged).
    // asNondeterministic: fusing alone does NOT stop the duplication —
    // PushPredicateThroughNonJoin rewrites filter(cell.isNotNull) on a
    // DETERMINISTIC alias to filter(cellU(v).isNotNull) below the
    // project, and Filter/Project don't share subexpressions, so the
    // fused normalize+argmax would run twice per row (k·dim work, the
    // dominant map-side cost at corpus scale). The function is pure;
    // the flag only pins one evaluation per row (verified: one
    // cellU in the physical plan, filter ABOVE the project).
    val cellU = udf((v: Seq[Double]) =>
      if (v == null || v.isEmpty) null
      else {
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n <= 0) null
        else java.lang.Integer.valueOf(argmaxCell(cs, v.map(_ / n)))
      }).asNondeterministic()
    Ann.prenorm(corpus.select(col(idCol).as("id"), col(vecCol).as("v0")),
        "id", col("v0"), "v", "nn").drop("v0")
      .withColumn("cell", cellU(col("v")))
      .filter(col("cell").isNotNull)
  }

  // normalize an already-double vector (prenorm output)
  private val normUdf0 = udf((v: Seq[Double]) =>
    if (v == null || v.isEmpty) null
    else {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n <= 0) null else v.map(_ / n)
    })

  /** Approximate top-k: probe the `nprobe` nearest cells per query
    * (map-side against broadcast centroids), exact cosine re-rank
    * within the probed inverted lists. Queries are broadcast, so the
    * corpus side is a map-side probe of the broadcast query table —
    * never shuffled; the only shuffle is the top-k window over scored
    * candidates (~nprobe/k of the corpus per query).
    */
  def knn(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cs = centroids
    val probeU = udf((v: Seq[Double]) =>
      if (v == null) null
      else {
        val dots = cs.indices.map { c =>
          val cv = cs(c)
          var d = 0.0; var i = 0
          val n = math.min(cv.length, v.length)
          while (i < n) { d += cv(i) * v(i); i += 1 }
          (d, c)
        }
        dots.sortBy { case (d, c) => (-d, c) }.take(math.min(nprobe, cs.length))
          .map(_._2).toArray
      })
    val c = assign(corpus, cs, idCol, vecCol)
      .select(col("cell"), col("id").as("neighbor_id"),
        col("v").as("cv"), col("nn").as("cn"))
    val q = broadcast(
      Ann.prenorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("q0")),
          "query_id", col("q0"), "qv", "qn").drop("q0")
        .withColumn("cell", explode(probeU(normUdf0(col("qv"))))))
    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", Ann.cosineFromParts(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** Inverted-list sizes (diagnostics: cell balance drives probe cost). */
  def cellSizes(corpus: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(corpus, centroids, idCol, vecCol).groupBy("cell").count()
}
