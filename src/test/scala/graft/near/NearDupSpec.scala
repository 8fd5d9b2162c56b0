package graft.near

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.Corpus

/** MinHash/LSH + SimHash recall vs planted near-duplicates
  * (SURVEY §5 port: recall ≥0.99 on the 0.95/0.8 tiers).
  */
class NearDupSpec extends SparkSpec {

  private val N = 1000L
  private lazy val docs = Corpus.docs(spark, N).toDF().filter(col("text").isNotNull)
  private lazy val truth = Corpus.truth(spark, N).toDF()

  private def truthPairs(kinds: String*) = {
    val pos = truth.filter(col("truth_kind").isin(kinds: _*))
    pos.select(col("url").as("src"), col("truth_group").as("g"))
      .join(pos.select(col("url").as("dst"), col("truth_group").as("g")), "g")
      .filter(col("src") < col("dst"))
      .select("src", "dst")
  }

  test("MinHash estimates track exact Jaccard (property over planted tiers)") {
    val sigs = MinHashLSH.signatures(docs).persist()
    val pairs = truthPairs("near_dup_95", "near_dup_80")
      .join(sigs.select(col("id").as("src"), col("sig").as("sig1"), col("shingles").as("sh1")), "src")
      .join(sigs.select(col("id").as("dst"), col("sig").as("sig2"), col("shingles").as("sh2")), "dst")
    val est = udf((a: Seq[Long], b: Seq[Long]) =>
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length)
    val jac = udf((a: Seq[Long], b: Seq[Long]) => Hashing.jaccard(a.toArray, b.toArray))
    val rows = pairs.select(est(col("sig1"), col("sig2")).as("est"),
      jac(col("sh1"), col("sh2")).as("exact")).collect()
    assert(rows.nonEmpty)
    val maxErr = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    info(f"max |minhash-est − exact-jaccard| = $maxErr%.3f over ${rows.length} pairs")
    assert(maxErr <= 0.20) // 128 perms → σ ≈ 0.044; 4.5σ bound
  }

  test("MinHash/LSH recall >= 0.99 on near-dup tiers above the threshold") {
    val edges = MinHashLSH.edges(docs).select("src", "dst")
      .withColumn("hit", lit(1))
    val tp = truthPairs("near_dup_95", "near_dup_80")
    val found = tp.join(edges, Seq("src", "dst"), "left")
    val total = tp.count().toDouble
    val recall = found.filter(col("hit").isNotNull).count() / total
    info(f"LSH recall = $recall%.4f over ${total.toLong} planted near-dup pairs")
    assert(recall >= 0.99)
  }

  test("exact duplicates are trivially found by MinHash too (sanity)") {
    val edges = MinHashLSH.edges(docs).select("src", "dst").withColumn("hit", lit(1))
    val tp = truthPairs("exact_dup")
    val recall = tp.join(edges, Seq("src", "dst"), "left")
      .filter(col("hit").isNotNull).count().toDouble / tp.count()
    assert(recall >= 0.99)
  }

  test("near_dup_50 tier (J≈0.5) is rejected by verification at θ=0.7") {
    val edges = MinHashLSH.edges(docs).select("src", "dst").withColumn("hit", lit(1))
    // near_dup_50 truth groups are singletons (intended negatives);
    // build all low-tier pairs directly — only same-century ones share
    // content, the rest are unrelated and must also stay unflagged
    val low = truth.filter(col("truth_kind") === "near_dup_50").select("url")
    val lowPairs = low.withColumnRenamed("url", "src")
      .crossJoin(low.withColumnRenamed("url", "dst"))
      .filter(col("src") < col("dst"))
    val hits = lowPairs.join(edges, Seq("src", "dst")).count()
    info(s"low-tier pairs flagged: $hits of ${lowPairs.count()}")
    assert(hits == 0)
  }

  /** Brute-force Hamming pairs over fingerprints — the oracle for the
    * pigeonhole-probing guarantee.
    */
  private def bruteHamPairs(fp: org.apache.spark.sql.DataFrame, maxHam: Int) = {
    val l = fp.select(col("id").as("src"), col("simhash").as("h1"))
    val r = fp.select(col("id").as("dst"), col("simhash").as("h2"))
    l.crossJoin(r).filter(col("src") < col("dst"))
      .filter(bit_count(col("h1").bitwiseXOR(col("h2"))) <= maxHam)
      .select("src", "dst")
  }

  test("SimHash probing finds EVERY pair within the Hamming ball (pigeonhole guarantee)") {
    val small = Corpus.docs(spark, 300L).toDF().filter(col("text").isNotNull)
    for (cfg <- Seq(SimHash.Config(), // Manku web-scale: 6 blocks, ham<=3
        SimHash.Config(blocks = 13, maxHamming = 12, maxBucket = 100000))) {
      val fp = SimHash.fingerprints(small, cfg).filter(col("simhash").isNotNull)
      val expect = bruteHamPairs(fp, cfg.maxHamming).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val got = SimHash.edges(small, cfg).select("src", "dst").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      info(s"cfg(blocks=${cfg.blocks}, ham<=${cfg.maxHamming}): ${expect.size} ball pairs")
      assert(got == expect)
    }
  }

  test("SimHash wide-ball config finds the 0.95 tier") {
    // small-corpus verification config: 13 tables on ~5-bit keys —
    // the ball radius the planted 0.95 tier measures at (shingle
    // features put it at ham ≈ 2-12; unrelated docs sit near 32)
    val cfg = SimHash.Config(blocks = 13, maxHamming = 12, maxBucket = 100000)
    val edges = SimHash.edges(docs, cfg).select("src", "dst").withColumn("hit", lit(1))
    val tp = truthPairs("near_dup_95")
    val recall = tp.join(edges, Seq("src", "dst"), "left")
      .filter(col("hit").isNotNull).count().toDouble / tp.count()
    info(f"SimHash recall on 0.95 tier = $recall%.3f")
    assert(recall >= 0.9)
  }

  test("SimHash does not link unrelated docs (precision on uniques)") {
    // even at the wide ball radius, unrelated docs (ham ~ 32) stay out
    val cfg = SimHash.Config(blocks = 13, maxHamming = 12, maxBucket = 100000)
    val edges = SimHash.edges(docs, cfg)
    val uniq = truth.filter(col("truth_kind") === "unique").select(col("url"))
    val false_ = edges
      .join(uniq.withColumnRenamed("url", "src"), "src")
      .join(uniq.withColumnRenamed("url", "dst"), "dst")
    assert(false_.count() == 0)
  }

  test("LSH hot-band cap drops a 100k-row bucket in bounded memory") {
    // pathological corpus: 100k identical docs → every band bucket is
    // 100k rows. The two-phase cap (count → semi-join → collect) must
    // never materialize the bucket; this completes in seconds and
    // bounded memory or not at all.
    import spark.implicits._
    val hot = spark.range(100000)
      .map(i => (s"u$i", "same tokens " * 30)).toDF("url", "text")
    val cfg = MinHashLSH.Config(maxBucket = 100)
    val sigs = MinHashLSH.signatures(hot, cfg)
    val skipped = MinHashLSH.skippedBucketRows(sigs, cfg)
      .agg(sum(col("count"))).head().getLong(0)
    assert(skipped == 100000L * cfg.bands)
    assert(MinHashLSH.candidates(sigs, cfg).count() == 0)
  }

  test("pipeline surfaces over-cap skipped-bucket rows as a metric") {
    import spark.implicits._
    val hot = spark.range(400)
      .map(i => (s"https://h.example/$i", "same tokens " * 30)).toDF("url", "text")
      .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .withColumn("html", col("text").cast("binary"))
      .withColumn("lang", lit("en"))
    val cfg = graft.pipeline.DedupPipeline.Config(
      minhash = MinHashLSH.Config(maxBucket = 50),
      simhash = SimHash.Config(maxBucket = 50))
    val r = graft.pipeline.DedupPipeline.run(hot, cfg)
    r.clusters.write.format("noop").mode("overwrite").save()
    assert(r.skippedBucketRows.getOrElse("minhash", 0L) > 0L)
    assert(r.skippedBucketRows.getOrElse("simhash", 0L) > 0L)
  }

  test("SimHash hot-bucket cap drops oversized buckets and reports them") {
    import spark.implicits._
    val hot = (0 until 500).map(i => (s"u$i", "same tokens " * 30)).toDF("url", "text")
    val cfg = SimHash.Config(maxBucket = 100)
    assert(SimHash.skippedBucketRows(hot, cfg).count() > 0)
    assert(SimHash.edges(hot, cfg).count() == 0)
  }

  test("salted two-round drain: 1M-row single-band bucket, no task holds it whole (r3 VERDICT #5)") {
    import spark.implicits._
    // 1M rows, ONE band, IDENTICAL signature → one bucket holding the
    // entire corpus: the documented pathological key for the one-task
    // O(rows) single-round drain. With salts = 16 the round-1 groups
    // each see ~1/16 of the bucket; round 2 merges bounded partials.
    val n = 1000000L
    val cfg = MinHashLSH.Config(numPerms = 4, bands = 1, maxBucket = 200, salts = 16)
    val sameSig = array((0 until 4).map(i => lit(7L * (i + 1))): _*)
    val sigs = spark.range(n)
      .select(concat(lit("u"), col("id")).as("id"), sameSig.as("sig"))
    // round-1 partials (the SHIPPING path's round 1 — same banded rows,
    // same memberSalt): one per salt, none anywhere near the full bucket
    val parts = MinHashLSH.saltedPartials(sigs, cfg).collect()
    assert(parts.length == cfg.salts)
    assert(parts.map(_._2).sum == n)
    assert(parts.forall(_._2 < n / 4), s"a partial held too much: ${parts.map(_._2).toSeq}")
    assert(parts.forall(_._3.length <= cfg.maxBucket + 1)) // bounded sample
    // merged output: one skip row carrying the true total, zero pairs
    val out = MinHashLSH.candidatesAndSkips(sigs, cfg).collect()
    assert(out.length == 1 && out(0).isNullAt(0) && out(0).getLong(2) == n)
    // and on a NON-hot corpus the salted path matches the single-round
    // path exactly (total ≤ cap ⇒ merged sample is the whole bucket)
    val small = spark.range(50)
      .select(concat(lit("u"), col("id")).as("id"), sameSig.as("sig"))
    val salted = MinHashLSH.candidatesAndSkips(small, cfg)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val single = MinHashLSH.candidatesAndSkips(small, cfg.copy(salts = 1))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(salted == single && salted.size == 50 * 49 / 2)
  }
}
