package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generalized two-round salted drain (r4 VERDICT #4): ONE
  * mechanism (CappedGroups.saltedDrain) behind all five pairing
  * stages — MinHash bands (covered in NearDupSpec), SimHash tables,
  * substring windows, winnowing grams, hyperplane buckets. Each
  * stage gets (a) a single-hot-key test in the 1M-row single-band
  * pattern — the whole corpus in one bucket, totals exact, no pair
  * blowup — and (b) a parity test: on a sub-cap corpus the salted
  * path's output is identical to the single-round path's.
  */
class SaltedDrainSpec extends SparkSpec {

  test("saltedDrain kernel: hot-key totals exact, merged buffer bounded, sub-cap buckets complete") {
    import spark.implicits._
    val cap = 50
    val salts = 16
    val rows = spark.range(200000).map(i => ("hot", s"m$i"))
      .union(spark.range(30).map(i => ("cold", s"c$i")))
    val out = CappedGroups.saltedDrain[String, String, (String, Long, Int, Seq[String])](
      rows, cap, salts, m => scala.util.hashing.MurmurHash3.stringHash(m),
      (k, total, buf) => Iterator.single((k, total, buf.length, buf.sorted.toSeq)))
      .collect().map(r => r._1 -> r).toMap
    // hot key: every row counted, merge stops growing at ~cap (the
    // per-key round-2 state is O(cap), never O(rows))
    assert(out("hot")._2 == 200000L)
    assert(out("hot")._3 <= 2 * cap + 1, s"merged buffer held ${out("hot")._3}")
    // cold key (total <= cap): every partial kept every member, so the
    // merged member list is the COMPLETE bucket
    assert(out("cold")._2 == 30L)
    assert(out("cold")._4 == (0 until 30).map(i => s"c$i").sorted)
  }

  test("SimHash salted: single hot probe bucket per table, skip totals exact, no pairs") {
    import graft.near.SimHash
    val n = 200000L
    val cfg = SimHash.Config(blocks = 4, maxHamming = 1, maxBucket = 100, salts = 8)
    val fp = spark.range(n)
      .select(concat(lit("u"), col("id")).as("id"), lit(0x0123456789abcdefL).as("simhash"))
    val rows = SimHash.edgesAndSkips(fp, cfg).collect()
    assert(rows.forall(_.isNullAt(0)), "an over-cap bucket emitted pairs")
    assert(rows.map(_.getLong(3)).sum == cfg.tables.length * n,
      s"skip totals ${rows.map(_.getLong(3)).toSeq} != ${cfg.tables.length} x $n")
  }

  test("SimHash salted == single-round on a sub-cap corpus (planted 1-bit pairs)") {
    import graft.near.SimHash
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 150).map(i => (s"b$i", rnd.nextLong()))
    val near = (0 until 20).map(i => (s"p$i", base(i)._2 ^ (1L << (i % 64))))
    val fp = (base ++ near).toDF("id", "simhash")
    def edgeSet(salts: Int) =
      SimHash.edgesAndSkips(fp, SimHash.Config(salts = salts)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val salted = edgeSet(8)
    assert(salted == edgeSet(1))
    assert((0 until 20).forall(i => salted.exists(e => e._1 == s"b$i" && e._2 == s"p$i"
      || e._1 == s"p$i" && e._2 == s"b$i")), "a planted 1-bit pair was lost")
  }

  test("substring windows salted: corpus-wide identical window drains to one exact skip row") {
    import graft.substring.SubstringDedup
    import spark.implicits._
    val sameText = (1 to 25).map(t => s"tok$t").mkString(" ")
    val docs = spark.range(2000).map(i => (s"u$i", sameText)).toDF("url", "text")
    val out = SubstringDedup.edgesAndSkips(docs, w = 20, stride = 10,
      maxDocsPerWindow = 50, salts = 8).collect()
    assert(out.length == 1 && out(0).isNullAt(0))
    assert(out(0).getLong(3) == 2000L, s"skip total ${out(0).getLong(3)}")
  }

  test("substring windows salted == single-round on a sub-cap corpus") {
    import graft.substring.SubstringDedup
    import spark.implicits._
    val run = (1 to 30).map(t => s"shared$t").mkString(" ")
    val docs = ((0 until 6).map(i => (s"d$i", s"prefix$i unique$i $run tail$i")) ++
      (0 until 4).map(i => (s"x$i", s"only $i here " * 10))).toDF("url", "text")
    def rows(salts: Int) =
      SubstringDedup.edgesAndSkips(docs, w = 10, stride = 5, salts = salts).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val salted = rows(8)
    assert(salted == rows(1) && salted.nonEmpty)
  }

  test("winnowing grams salted: identical corpus drains to exact skip totals, no pairs") {
    import graft.substring.SubstringDedup
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again in summer"
    val docs = spark.range(1000).map(i => (s"u$i", text)).toDF("url", "text")
    val out = SubstringDedup.repeatCandidatesAndSkips(docs, minLen = 30,
      maxDocsPerGram = 50, salts = 8).collect()
    assert(out.forall(_.isNullAt(0)), "an over-cap gram emitted pairs")
    assert(out.nonEmpty && out.forall(_.getLong(2) == 1000L))
  }

  test("winnowing grams salted == single-round on a sub-cap corpus") {
    import graft.substring.SubstringDedup
    import spark.implicits._
    val shared = "an exact shared run of at least forty characters sits right here"
    val docs = ((0 until 5).map(i => (s"d$i", s"head$i $shared tail$i")) ++
      (0 until 5).map(i => (s"x$i", s"completely unrelated text number $i " * 3)))
      .toDF("url", "text")
    def rows(salts: Int) =
      SubstringDedup.repeatCandidatesAndSkips(docs, minLen = 40, salts = salts)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = rows(8)
    assert(salted == rows(1) && salted.exists(_._1 != null))
  }

  test("hyperplane buckets salted: one bucket per table holds the corpus, skip totals exact") {
    import graft.sim.Ann
    import spark.implicits._
    val n = 100000L
    val vec = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val corpus = spark.range(n)
      .map(i => (s"v$i", vec)).toDF("vec_id", "embedding")
    val out = Ann.candidatePairsAndSkips(corpus, bits = 8, tables = 2, seed = 42L,
      "vec_id", "embedding", maxBucket = 100, salts = 8).collect()
    assert(out.forall(_.isNullAt(0)), "an over-cap bucket emitted pairs")
    assert(out.map(_.getLong(2)).sum == 2 * n)
  }

  test("hyperplane buckets salted == single-round on a sub-cap corpus") {
    import graft.sim.Ann
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 60)
      .map(i => (s"v$i", Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    def rows(salts: Int) =
      Ann.candidatePairsAndSkips(corpus, bits = 4, tables = 3, seed = 42L,
        "vec_id", "embedding", maxBucket = 500, salts = salts)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val salted = rows(8)
    assert(salted == rows(1) && salted.nonEmpty)
  }
}
