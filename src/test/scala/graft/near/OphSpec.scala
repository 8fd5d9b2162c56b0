package graft.near

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.Corpus

/** One-permutation MinHash (densified) vs the k-permutation batch:
  * kernel correctness against a naive reference, the LSH estimator
  * property, and end-to-end recall parity under `Config(oph = true)`.
  */
class OphSpec extends SparkSpec {

  /** Naive reference: per-bin unsigned minima by explicit grouping,
    * then empty bins filled by explicit circular right search — the
    * definition, independently of the one-pass sweep.
    */
  private def naiveOph(shingles: Array[Long], k: Int, seed: Long): Array[Long] = {
    val C = 0x9e3779b97f4a7c15L
    val hs = shingles.map(x => Hashing.mix64(seed ^ x))
    val byBin = hs.groupBy(h => java.lang.Long.remainderUnsigned(h, k).toInt)
    val mins = byBin.map { case (b, vs) => b -> vs.min(Ordering.fromLessThan[Long](
      (a, c) => java.lang.Long.compareUnsigned(a, c) < 0)) }
    Array.tabulate(k) { j =>
      val d = (0 until k).find(d => mins.contains((j + d) % k)).get
      mins((j + d) % k) + d * C
    }
  }

  test("one-pass kernel == naive definition (random sets, incl. sparse)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(if (trial % 2 == 0) 5 else 400) // sparse half forces empty bins
      val sh = Array.fill(n)(rnd.nextLong())
      val k = Seq(8, 32, 128)(trial % 3)
      assert(Hashing.ophMinhash(sh, k, 42L).toSeq == naiveOph(sh, k, 42L).toSeq,
        s"trial $trial n=$n k=$k")
    }
  }

  test("identical shingle sets get identical signatures; order-insensitive; empty -> null") {
    val sh = Array(3L, -9L, 77L, Long.MinValue, 0L)
    val a = Hashing.ophMinhash(sh, 32, 1L)
    val b = Hashing.ophMinhash(sh.reverse, 32, 1L)
    assert(a.toSeq == b.toSeq)
    assert(Hashing.ophMinhash(Array.empty[Long], 32, 1L) == null)
  }

  test("a single-shingle set fills all k bins via rotation (every component defined)") {
    val sig = Hashing.ophMinhash(Array(123456789L), 16, 9L)
    assert(sig.length == 16)
    val h = Hashing.mix64(9L ^ 123456789L)
    val bin = java.lang.Long.remainderUnsigned(h, 16).toInt
    assert(sig(bin) == h)
    val C = 0x9e3779b97f4a7c15L
    for (j <- 0 until 16; if j != bin) {
      val d = Math.floorMod(bin - j, 16)
      assert(sig(j) == h + d * C, s"bin $j should borrow from $bin at distance $d")
    }
  }

  test("OPH estimator tracks exact Jaccard on planted tiers (higher variance than 128-perm)") {
    val docs = Corpus.docs(spark, 1000L).toDF().filter(col("text").isNotNull)
    val truth = Corpus.truth(spark, 1000L).toDF()
    val pos = truth.filter(col("truth_kind").isin("near_dup_95", "near_dup_80"))
    val pairs = pos.select(col("url").as("src"), col("truth_group").as("g"))
      .join(pos.select(col("url").as("dst"), col("truth_group").as("g")), "g")
      .filter(col("src") < col("dst")).select("src", "dst")
    val sigs = MinHashLSH.signatures(docs, MinHashLSH.Config(oph = true)).persist()
    val joined = pairs
      .join(sigs.select(col("id").as("src"), col("sig").as("sig1"), col("shingles").as("sh1")), "src")
      .join(sigs.select(col("id").as("dst"), col("sig").as("sig2"), col("shingles").as("sh2")), "dst")
    val est = udf((a: Seq[Long], b: Seq[Long]) =>
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length)
    val jac = udf((a: Seq[Long], b: Seq[Long]) => Hashing.jaccard(a.toArray, b.toArray))
    val rows = joined.select(est(col("sig1"), col("sig2")).as("est"),
      jac(col("sh1"), col("sh2")).as("exact")).collect()
    assert(rows.nonEmpty)
    val maxErr = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    info(f"max |oph-est - exact-jaccard| = $maxErr%.3f over ${rows.length} pairs")
    assert(maxErr <= 0.25) // DOPH variance >= iid-perm variance; bound loosened vs 0.20
    sigs.unpersist()
  }

  test("end-to-end LSH recall >= 0.99 with Config(oph = true)") {
    val docs = Corpus.docs(spark, 1000L).toDF().filter(col("text").isNotNull)
    val truth = Corpus.truth(spark, 1000L).toDF()
    val pos = truth.filter(col("truth_kind").isin("near_dup_95", "near_dup_80"))
    val tp = pos.select(col("url").as("src"), col("truth_group").as("g"))
      .join(pos.select(col("url").as("dst"), col("truth_group").as("g")), "g")
      .filter(col("src") < col("dst")).select("src", "dst")
    val edges = MinHashLSH.edges(docs, MinHashLSH.Config(oph = true))
      .select("src", "dst").withColumn("hit", lit(1))
    val total = tp.count().toDouble
    val recall = tp.join(edges, Seq("src", "dst"), "left")
      .filter(col("hit").isNotNull).count() / total
    info(f"OPH LSH recall = $recall%.4f over ${total.toLong} planted pairs")
    assert(recall >= 0.99)
  }
}
