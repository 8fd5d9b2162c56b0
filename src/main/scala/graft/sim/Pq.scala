package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization ANN — the memory-side scale path beside the
  * IVF coarse quantizer (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011; the FAISS IVFPQ design
  * with by_residual=false): each unit-normalized vector is split into
  * `m` subvectors, each quantized to one of `ksub` per-subspace
  * centroids, so a d-float embedding becomes m small codes (m bytes at
  * ksub=256). At 10^12 vectors the code table is what fits a cluster's
  * memory/disk budget — 16 bytes/vector instead of 3 KB — and the full
  * vectors are touched only for the final refine join.
  *
  * Search is the standard three-stage funnel:
  *   1. coarse probe — [[Ivf.assign]] cells cut the scan to
  *      ~nprobe/k_coarse of the corpus (reused unchanged);
  *   2. ADC shortlist — per query one (m × ksub) lookup table of
  *      subspace distances, candidate distance = m table adds per CODE
  *      (no vector reads; the code table never carries embeddings);
  *   3. exact refine — the top `refine` ADC candidates join BACK to
  *      the vector table by id (one id-keyed shuffle join sized by
  *      queries × refine, not corpus) for exact-cosine re-ranking.
  *
  * On unit vectors L2² = 2 − 2·cos, so ADC L2 order IS cosine order up
  * to quantization error — the refine stage exists precisely to fix
  * that error on the shortlist.
  *
  * Determinism: codebooks train like [[Ivf.train]] (deterministic
  * bounded hash-sample, fixed init and summation order, ties → lowest
  * index), encoding is a pure function of (vector, codebooks), ADC
  * sums run in fixed subspace order — identical inputs give identical
  * results at any parallelism.
  */
object Pq {

  /** m × ksub × dsub codebooks (dsub = dim/m, last subspace absorbs
    * any remainder).
    */
  type Codebooks = Array[Array[Array[Double]]]

  private def subRanges(dim: Int, m: Int): Array[(Int, Int)] = {
    val base = dim / m
    Array.tabulate(m)(s => (s * base, if (s == m - 1) dim else (s + 1) * base))
  }

  private def normalize(v: Seq[Float]): Array[Double] =
    if (v == null) null else normalizeD(v.map(_.toDouble))

  private def normalizeD(v: Seq[Double]): Array[Double] = {
    if (v == null || v.isEmpty) return null
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    if (n <= 0) return null
    val s = 1.0 / math.sqrt(n)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * s; i += 1 }
    out
  }

  private def l2sq(a: Array[Double], aFrom: Int, aTo: Int,
      c: Array[Double]): Double = {
    var d = 0.0; var i = aFrom; var j = 0
    while (i < aTo) { val x = a(i) - c(j); d += x * x; i += 1; j += 1 }
    d
  }

  /** Nearest codebook entry for subvector [from, to) (ties → lowest
    * index, the [[Ivf]] convention).
    */
  private def nearest(cb: Array[Array[Double]], v: Array[Double],
      from: Int, to: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val d = l2sq(v, from, to, cb(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train per-subspace L2 k-means codebooks on the [[Ivf.train]]
    * recipe: ONE bounded deterministic hash-sample job, Lloyd rounds
    * in-driver (the driver holds maxSample·dim doubles — a model
    * artifact, not the data path; assignment/search stay distributed).
    */
  def train(corpus: DataFrame, m: Int = 16, ksub: Int = 256, iters: Int = 5,
      sampleMod: Int = 1, idCol: String = "vec_id", vecCol: String = "embedding",
      maxSample: Int = 65536): Codebooks = {
    val normU = udf((v: Seq[Float]) => normalize(v))
    val sample: Array[Array[Double]] = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
      .select(xxhash64(col(idCol)).as("h"), col(idCol).as("id"),
        normU(col(vecCol)).as("nv"))
      .filter(col("nv").isNotNull)
      .orderBy(col("h"), col("id"))
      .limit(maxSample)
      .select(col("nv"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(m >= 1 && m <= dim, s"m=$m must be in [1, dim=$dim]")
    val ranges = subRanges(dim, m)
    ranges.map { case (from, to) =>
      val dsub = to - from
      val kk = math.min(ksub, sample.length)
      var cb = Array.tabulate(kk)(c =>
        java.util.Arrays.copyOfRange(sample(c), from, to))
      for (_ <- 1 to iters) {
        val sums = Array.fill(kk)(new Array[Double](dsub))
        val counts = new Array[Long](kk)
        var i = 0
        while (i < sample.length) {
          val v = sample(i)
          val c = nearest(cb, v, from, to)
          val s = sums(c)
          var d = 0
          while (d < dsub) { s(d) += v(from + d); d += 1 }
          counts(c) += 1
          i += 1
        }
        cb = Array.tabulate(kk)(c =>
          if (counts(c) == 0) cb(c) else sums(c).map(_ / counts(c)))
      }
      cb
    }
  }

  /** Codebooks as a Catalog model artifact (the [[Ivf
    * .trainCheckpointed]] contract): a resumed run with unchanged
    * lineage + config reads the staged (sub, code, centroid) table
    * back instead of retraining, keeping codes stable across runs.
    */
  def trainCheckpointed(corpus: DataFrame, catalog: graft.checkpoint.Catalog,
      name: String, inputLineage: String, m: Int = 16, ksub: Int = 256,
      iters: Int = 5, sampleMod: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding", maxSample: Int = 65536): Codebooks = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val lineage = s"$inputLineage|pq:m=$m|ksub=$ksub|iters=$iters|mod=$sampleMod" +
      s"|id=$idCol|vec=$vecCol|max=$maxSample"
    val df = catalog.stage(name, lineage) {
      train(corpus, m, ksub, iters, sampleMod, idCol, vecCol, maxSample)
        .zipWithIndex.flatMap { case (cb, s) =>
          cb.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
        }.toSeq.toDF("sub", "code", "centroid")
    }
    val rows = df.collect()
    val m2 = rows.map(_.getInt(0)).max + 1
    Array.tabulate(m2) { s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray)
    }
  }

  /** The CODE TABLE: (id, code[m]) — the only corpus-sized thing the
    * ADC stage ever reads. Null/zero-norm vectors drop (the [[Ivf]]
    * contract). Codes are Int (ksub ≤ 256 fits a byte on disk;
    * parquet dictionary-encodes either way).
    */
  def encode(corpus: DataFrame, codebooks: Codebooks,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cbs = codebooks
    val encU = udf((v: Seq[Float]) => {
      val nv = normalize(v)
      if (nv == null) null
      else {
        val ranges = subRanges(nv.length, cbs.length)
        Array.tabulate(cbs.length)(s =>
          nearest(cbs(s), nv, ranges(s)._1, ranges(s)._2))
      }
    })
    corpus.select(col(idCol).as("id"), encU(col(vecCol)).as("code"))
      .filter(col("code").isNotNull)
  }

  /** ADC distance of a query's normalized vector to a code, summed in
    * fixed subspace order. Exposed for specs.
    */
  def adcDistance(codebooks: Codebooks, nv: Array[Double],
      code: Array[Int]): Double = {
    val ranges = subRanges(nv.length, codebooks.length)
    var d = 0.0; var s = 0
    while (s < codebooks.length) {
      d += l2sq(nv, ranges(s)._1, ranges(s)._2, codebooks(s)(code(s)))
      s += 1
    }
    d
  }

  /** IVF-PQ top-k: coarse cells ([[Ivf.assign]]) keyed by the SHARED
    * coarse centroids, ADC shortlist of `refine` per query over the
    * code table, exact-cosine re-rank of the shortlist after one
    * id-keyed join back to the vectors. Queries (with their LUT-ready
    * normalized vectors) are broadcast; the corpus never shuffles
    * until the shortlist join.
    */
  def knn(corpus: DataFrame, queries: DataFrame, k: Int,
      coarse: Array[Array[Double]], codebooks: Codebooks,
      nprobe: Int = 8, refine: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(refine >= k, s"refine=$refine must be >= k=$k")
    val cs = coarse
    val cbs = codebooks
    // (cell, id, code): assign reuses the coarse quantizer; encode
    // runs in the same map stage; the full vector column is DROPPED
    // before anything wide happens
    val codes = {
      val assigned = Ivf.assign(corpus, cs, idCol, vecCol)
        .select(col("cell"), col("id"), col("v"))
      // Ivf.assign's `v` is the DOUBLE vector (prenorm casts, it does
      // not scale) — PQ codes are defined over the unit direction
      val encU = udf((v: Seq[Double]) => {
        val a = normalizeD(v)
        if (a == null) null
        else {
          val ranges = subRanges(a.length, cbs.length)
          Array.tabulate(cbs.length)(s =>
            nearest(cbs(s), a, ranges(s)._1, ranges(s)._2))
        }
      })
      assigned.select(col("cell"), col("id").as("neighbor_id"),
        encU(col("v")).as("code"))
        .filter(col("code").isNotNull)
    }
    val probeU = udf((v: Seq[Double]) => {
      val nv = normalizeD(v)
      if (nv == null) null
      else {
        val dots = cs.indices.map { c =>
          val cv = cs(c)
          var d = 0.0; var i = 0
          val n = math.min(cv.length, nv.length)
          while (i < n) { d += cv(i) * nv(i); i += 1 }
          (d, c)
        }
        dots.sortBy { case (d, c) => (-d, c) }.take(math.min(nprobe, cs.length))
          .map(_._2).toArray
      }
    })
    // per-query ADC lookup table (m × ksub flattened): one O(dim·ksub)
    // setup per query row, then every candidate costs m table adds —
    // the TPAMI §IV ADC hot path (vs O(dim) per pair recomputed)
    val lutU = udf((v: Seq[Double]) => {
      val nv = normalizeD(v)
      if (nv == null) null
      else {
        val ranges = subRanges(nv.length, cbs.length)
        val out = new Array[Double](cbs.length * cbs(0).length)
        var s = 0
        while (s < cbs.length) {
          var c = 0
          while (c < cbs(s).length) {
            out(s * cbs(0).length + c) = l2sq(nv, ranges(s)._1, ranges(s)._2, cbs(s)(c))
            c += 1
          }
          s += 1
        }
        out
      }
    })
    val q = broadcast(
      Ann.prenorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("q0")),
          "query_id", col("q0"), "qv", "qn").drop("q0")
        .withColumn("lut", lutU(col("qv")))
        .filter(col("lut").isNotNull)
        .withColumn("cell", explode(probeU(col("qv")))))
    val kSub = cbs(0).length
    val adcU = udf((lut: Seq[Double], code: Seq[Int]) => {
      var d = 0.0; var s = 0
      while (s < code.length) { d += lut(s * kSub + code(s)); s += 1 }
      d
    })
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    val shortlist = q.join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adcU(col("lut"), col("code")))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= refine)
      .select(col("query_id"), col("qv"), col("qn"), col("neighbor_id"))
    // refine: exact cosine on the shortlist only — the one place full
    // vectors are read, keyed by id
    val vecs = Ann.prenorm(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("v0")), "neighbor_id", col("v0"), "cv", "cn").drop("v0")
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    shortlist.join(vecs, Seq("neighbor_id"))
      .withColumn("score", Ann.cosineFromParts(col("qv"), col("qn"), col("cv"), col("cn")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }
}
