package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** IVF-PQ: code determinism under scaling, ADC consistency with the
  * local reference, planted-copy top-1 through the full
  * probe→ADC→refine funnel, and the refine guard.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Positively scaled copies — identical unit direction, so PQ codes
    * and coarse cells match the originals structurally (the
    * SemDeDupSpec planting discipline).
    */
  private def planted(firstN: Int, offset: Long) =
    emb.filter(col("vec_id") < firstN).select(
      (col("vec_id") + offset).as("vec_id"),
      transform(col("embedding"),
        x => (x.cast("double") * 1.001).cast("float")).as("embedding"))

  test("codes are scale-invariant: a scaled copy gets the identical code") {
    val corpus = emb.select("vec_id", "embedding").unionByName(planted(10, 100000L))
    val cbs = Pq.train(corpus, m = 8, ksub = 16, iters = 3)
    val codes = Pq.encode(corpus, cbs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    (0 until 10).foreach { i =>
      assert(codes(i.toLong) == codes(i + 100000L), s"code differs for copy $i")
    }
    assert(codes.values.head.length == 8)
  }

  test("ADC distance of a vector to its own code equals the local quantization error") {
    val corpus = emb.select("vec_id", "embedding")
    val cbs = Pq.train(corpus, m = 4, ksub = 8, iters = 2)
    val rows = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val codes = Pq.encode(corpus.filter(col("vec_id") < 5), cbs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    rows.foreach { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      val nv = v.map(_ / n)
      val d = Pq.adcDistance(cbs, nv, codes(id))
      assert(d >= 0.0 && d < 2.0, s"vec $id quantization error $d out of range")
      // the own-code ADC distance is the minimum over all codes in
      // each subspace by construction of encode (argmin per subspace)
      val ranges = (0 until 4).map { s =>
        val base = nv.length / 4
        (s * base, if (s == 3) nv.length else (s + 1) * base)
      }
      ranges.zipWithIndex.foreach { case ((from, to), s) =>
        val own = cbs(s)(codes(id)(s))
        val ownD = (from until to).map(i => {
          val x = nv(i) - own(i - from); x * x
        }).sum
        cbs(s).foreach { c =>
          val d2 = (from until to).map(i => {
            val x = nv(i) - c(i - from); x * x
          }).sum
          assert(ownD <= d2 + 1e-12, s"subspace $s code not argmin")
        }
      }
    }
  }

  test("IVF-PQ funnel finds planted exact-direction copies at top-1") {
    val corpus = emb.select("vec_id", "embedding").unionByName(planted(20, 100000L))
    val coarse = Ivf.train(corpus, k = 8, iters = 3)
    val cbs = Pq.train(corpus, m = 8, ksub = 32, iters = 3)
    val queries = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
    val top = Pq.knn(corpus, queries, k = 1, coarse, cbs, nprobe = 4, refine = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 20).foreach { i =>
      val got = top(i + 200000L)
      // the copy (i or i+100000) has cosine 1.0 to the query; either
      // representative wins the refine — both are the planted pair
      assert(got == i.toLong || got == i + 100000L,
        s"query $i top-1 = $got, expected the planted copy")
    }
  }

  test("refine < k is rejected") {
    val corpus = emb.select("vec_id", "embedding")
    val coarse = Ivf.train(corpus, k = 2, iters = 1)
    val cbs = Pq.train(corpus, m = 2, ksub = 4, iters = 1)
    intercept[IllegalArgumentException] {
      Pq.knn(corpus, corpus.limit(1), k = 8, coarse, cbs, refine = 4)
    }
  }

  test("checkpointed codebooks: second call resumes from the artifact, bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("pq-cat-").toString
    val corpus = emb.select("vec_id", "embedding")
    val cat = new graft.checkpoint.Catalog(dir, spark)
    val a = Pq.trainCheckpointed(corpus, cat, "pq_cb", "lineageX", m = 4, ksub = 8, iters = 2)
    // poison-pill check: a fresh Catalog over the same dir must READ,
    // not retrain — feed it a corpus that would train differently
    val cat2 = new graft.checkpoint.Catalog(dir, spark)
    val b = Pq.trainCheckpointed(corpus.filter(col("vec_id") % 2 === 0), cat2,
      "pq_cb", "lineageX", m = 4, ksub = 8, iters = 2)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (cx, cy) => assert(cx.sameElements(cy)) }
    }
  }
}
