package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Positively scaled copies: identical direction ⇒ identical
    * normalized vector ⇒ identical argmax cell under ANY centroids —
    * structural recall, the q_embedding_dup planting discipline.
    */
  private def planted(firstN: Int, offset: Long) =
    emb.filter(col("vec_id") < firstN).select(
      (col("vec_id") + offset).as("vec_id"),
      transform(col("embedding"),
        x => (x.cast("double") * 1.001).cast("float")).as("embedding"))

  test("planted scaled copies are found exactly; unrelated vectors are not linked") {
    val corpus = emb.select("vec_id", "embedding").unionByName(planted(20, 100000L))
    val centroids = Ivf.train(corpus, k = 8, iters = 3)
    val edges = SemDeDup.edges(corpus, centroids, 0.99, maxCell = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 20).map(i => (i.toLong, i + 100000L)).toSet
    assert(edges == want, s"missing=${want -- edges} extra=${edges -- want}")
  }

  test("keepers: a semantic-dup chain collapses to one representative; singletons keep themselves") {
    val corpus = emb.select("vec_id", "embedding")
      .unionByName(planted(5, 100000L)).unionByName(planted(5, 200000L))
    val centroids = Ivf.train(corpus, k = 4, iters = 2)
    val k = SemDeDup.keepers(corpus, centroids, 0.99, maxCell = 1000000)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 5).foreach { i =>
      // triple {i, i+1e5, i+2e5}: all three share the min-string keeper
      val ks = Set(k(i.toLong), k(i + 100000L), k(i + 200000L))
      assert(ks.size == 1, s"chain $i split across keepers: $ks")
    }
    assert(k(50L) == "50", "no-dup vector keeps itself")
  }

  test("an over-cap cell is capped AND surfaced as one summed skip row") {
    // one dominant direction: 500 copies of vector 0 → one cell holds
    // them all → maxCell 10 must skip it and count its members
    val hot = emb.filter(col("vec_id") === 0).select(col("embedding")).crossJoin(
      spark.range(500).select(col("id").as("vec_id")))
      .select(col("vec_id"), col("embedding"))
    val centroids = Ivf.train(hot, k = 2, iters = 1)
    val out = SemDeDup.edgesAndSkips(hot, centroids, 0.99, maxCell = 10)
    val skips = out.filter(col("src").isNull).collect()
    assert(skips.length == 1 && skips(0).getLong(3) == 500L)
    assert(out.filter(col("src").isNotNull).count() == 0L)
  }

  test("salted drain spreads a dominant cell across round-1 tasks with identical results") {
    val corpus = emb.select("vec_id", "embedding").unionByName(planted(10, 100000L))
    val centroids = Ivf.train(corpus, k = 2, iters = 2)
    val plain = SemDeDup.edges(corpus, centroids, 0.99, maxCell = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SemDeDup.edges(corpus, centroids, 0.99, maxCell = 1000000, salts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain == salted)
  }
}
