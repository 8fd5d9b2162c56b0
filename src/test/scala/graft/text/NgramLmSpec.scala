package graft.text

import graft.SparkSpec

/** Bigram-LM scoring: counts and micro-nat log-probs verified against
  * closed-form arithmetic on a tiny corpus; integer-sum determinism;
  * unseen-bigram add-one floor when scoring a different corpus.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "a b", "a b", "a c" → unigrams a:3 b:2 c:1, V=3
  // bigrams: "a b":2, "a c":1
  private def docs = Seq(
    (0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")

  private def micro(cBig: Long, cUni: Long, v: Long): Long =
    math.round(math.log((cBig + 1.0) / (cUni + v)) * 1e6)

  test("scoreSelf: closed-form micro-nat sums per doc") {
    val r = NgramLm.scoreSelf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    val ab = micro(2, 3, 3) // ln(3/6)
    val ac = micro(1, 3, 3) // ln(2/6)
    assert(r(0L)._1 == 1L && r(0L)._2 == ab)
    assert(math.abs(r(0L)._3 - ab / 1e6) < 1e-9)
    assert(r(1L)._2 == ab)
    assert(r(2L)._2 == ac)
    assert(math.abs(r(2L)._3 - ac / 1e6) < 1e-9)
  }

  test("zero-bigram docs (blank, single-token, null) appear with zeros") {
    val d = Seq((0L, Some("a b")), (1L, Some("solo")), (2L, Some("  ")),
      (3L, None: Option[String])).toDF("doc_id", "text")
    val r = NgramLm.scoreSelf(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r.size == 4)
    assert(r(1L) == ((0L, 0L, 0.0)))
    assert(r(2L) == ((0L, 0L, 0.0)))
    assert(r(3L) == ((0L, 0L, 0.0)))
    assert(r(0L)._1 == 1L)
  }

  test("unseen bigrams under a foreign model hit the add-one floor") {
    val model = NgramLm.train(docs)
    // "b a": bigram unseen (c_big=0), w1="b" seen with c_uni=2
    // "z z": both unseen → c_big=0, c_uni=0
    val eval = Seq((10L, "b a"), (11L, "z z")).toDF("doc_id", "text")
    val r = NgramLm.score(eval, model).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(10L) == micro(0, 2, 3)) // ln(1/5)
    assert(r(11L) == micro(0, 0, 3)) // ln(1/3)
  }

  test("case folding: tokens are lowercased before counting") {
    val d = Seq((0L, "A b"), (1L, "a B")).toDF("doc_id", "text")
    val r = NgramLm.scoreSelf(d).collect().map(_.getLong(2)).distinct
    assert(r.length == 1) // both docs are the same bigram after folding
  }

  test("ccnetBuckets: full-corpus terciles cut at the ceil(n/3) sample values") {
    // 9 docs with strictly ordered surprise: doc i repeats a common
    // bigram (9-i) times and a rare doc-unique bigram i times -> the
    // more unique bigrams, the more negative the average log-prob
    val d = (0 until 9).map { i =>
      i.toLong -> (("common pair " * (9 - i)) + s"rare$i only$i " * i).trim
    }.toDF("doc_id", "text")
    val out = NgramLm.ccnetBuckets(d, sampleFrac = 1.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out.size == 9)
    // buckets are value-monotone: every tail score <= every middle
    // score <= every head score, and each tercile is non-empty
    val by = out.values.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSeq }
    assert(by.keySet == Set("tail", "middle", "head"))
    assert(by("tail").max <= by("middle").min)
    assert(by("middle").max <= by("head").min)
    // thresholds from the FULL sorted list: tail gets ranks 1..3
    val sorted = out.values.map(_._1).toSeq.sorted
    assert(by("tail").forall(_ <= sorted(2)))
  }

  test("ccnetBuckets: the hash-sample mechanism changes thresholds deterministically") {
    val d = (0 until 40).map { i =>
      i.toLong -> (("common pair " * (40 - i)) + s"rare$i only$i " * i).trim
    }.toDF("doc_id", "text")
    val full = NgramLm.ccnetBuckets(d, sampleFrac = 1.0).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val half1 = NgramLm.ccnetBuckets(d, sampleFrac = 0.5).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val half2 = NgramLm.ccnetBuckets(d, sampleFrac = 0.5).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(half1 == half2, "sampled thresholds are not deterministic")
    assert(full.values.toSet == Set("tail", "middle", "head"))
    assert(half1.values.toSet == Set("tail", "middle", "head"))
  }

  test("ccnetBuckets: config rejects and the sample cap trips") {
    val d = (0 until 9).map(i => i.toLong -> s"a b c $i").toDF("doc_id", "text")
    intercept[IllegalArgumentException](NgramLm.ccnetBuckets(d, sampleFrac = 0.0))
    intercept[IllegalArgumentException](NgramLm.ccnetBuckets(d, sampleFrac = 1.5))
    intercept[IllegalArgumentException](
      NgramLm.ccnetBuckets(d, sampleFrac = 1.0, sampleCap = 4))
  }

  test("DSIR: importance ranks target-domain docs above off-domain, selection keeps exactly k") {
    // two sub-languages: "med"-vocab docs (the target domain) and
    // "web"-vocab docs; raw corpus is the union. Importance must rank
    // every med doc above every web doc.
    val med = (0 until 20).map(i =>
      (i.toLong, s"dose trial patient cohort dose trial v$i"))
    val web = (20 until 60).map(i =>
      (i.toLong, s"click buy sale cheap deal offer v$i"))
    val d = (med ++ web).toDF("doc_id", "text")
    val target = d.filter($"doc_id" < 20)
    val imp = Dsir.importance(d, target).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val medMin = (0L until 20L).map(imp).min
    val webMax = (20L until 60L).map(imp).max
    assert(medMin > webMax,
      s"target docs must out-rank off-domain: med min $medMin vs web max $webMax")
    val sel = Dsir.resample(d, target, k = 20).collect()
    assert(sel.count(_.getBoolean(3)) == 20)
    assert(sel.filter(_.getBoolean(3)).forall(_.getLong(0) < 20L),
      "the k kept docs must be exactly the target-domain ones")
  }

  test("DSIR: Gumbel resampling is deterministic per salt and perturbs the argmax cut") {
    // one flat importance region (identical text) — beta=0 cuts by the
    // md5 tie-shuffle; a large beta re-draws, so the kept set under a
    // DIFFERENT salt differs while the same salt reproduces exactly
    val d = (0 until 40).map(i => (i.toLong, "same text here")).toDF("doc_id", "text")
    def kept(beta: Double, salt: String): Set[Long] =
      Dsir.resample(d, d, k = 10, gumbelBeta = beta, salt = salt).collect()
        .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(kept(5.0, "s1") == kept(5.0, "s1"), "same salt must reproduce")
    assert(kept(5.0, "s1") != kept(5.0, "s2") || kept(5.0, "s1") != kept(0.0, "s2"),
      "different salts should re-draw the flat-region cut")
    assert(kept(0.0, "s1").size == 10)
    intercept[IllegalArgumentException](Dsir.resample(d, d, k = -1))
    intercept[IllegalArgumentException](Dsir.resample(d, d, k = 1, gumbelBeta = -0.5))
  }
}
