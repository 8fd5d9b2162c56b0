package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // Structured mini-corpus: real text has PREDICTABLE bigrams (the
  // premise the discriminator exploits). The shared synthetic corpus
  // is iid unigram draws — order-free by construction — so it cannot
  // carry this test; these template sentences can.
  private val sentences = Vector(
    "the quick brown fox jumps over the lazy dog",
    "a journey of a thousand miles begins with a single step",
    "actions speak louder than words in every case",
    "practice makes perfect when you repeat the drill",
    "the early bird catches the worm before sunrise",
    "a picture is worth a thousand words they say",
    "better late than never but never late is better",
    "all that glitters is not gold in the mine",
    "the pen is mightier than the sword in print",
    "when in rome do as the romans do")

  private def doc(i: Long): String =
    (0 until 8).map(k => sentences(
      (graft.near.Hashing.mix64(i * 31 + k) >>> 8).toInt.abs % sentences.length))
      .mkString(" ")

  private def corpus(ids: Seq[Long]) =
    ids.map(i => (i, doc(i))).toDF("doc_id", "text")

  test("corrupt() is a deterministic permutation preserving the token multiset") {
    val d = corpus(0L until 20L)
    val c1 = QualityModel.corrupt(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val c2 = QualityModel.corrupt(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c1 == c2) // stable across runs
    val orig = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, t) <- orig) {
      assert(c1(id) != t, s"doc $id not permuted") // order broken...
      assert(c1(id).split(" ").sorted.toSeq == t.split(" ").sorted.toSeq) // ...multiset kept
    }
  }

  test("bigram discriminator separates real docs from token-shuffled gibberish (held-out AUC)") {
    val train = corpus(0L until 400L)
    val held = corpus(1000L until 1200L)
    val model = QualityModel.train(train)
    val pos = QualityModel.score(model, held)
      .collect().map(_.getDouble(1) -> 1)
    val neg = QualityModel.score(model, QualityModel.corrupt(held))
      .collect().map(_.getDouble(1) -> 0)
    val ranked = (pos ++ neg).sortBy(_._1)
    // AUC via rank-sum (Mann-Whitney)
    val ranks = ranked.zipWithIndex.collect { case ((_, 1), r) => r + 1.0 }
    val nPos = pos.length.toDouble
    val nNeg = neg.length.toDouble
    val auc = (ranks.sum - nPos * (nPos + 1) / 2) / (nPos * nNeg)
    info(f"held-out AUC = $auc%.4f over ${pos.length} pos / ${neg.length} neg")
    assert(auc >= 0.95, f"AUC $auc%.3f — discriminator failed to learn bigram structure")
  }

  test("training cap: a deterministic hash-sample keeps the fit bounded") {
    val big = corpus(0L until 300L)
    val m1 = QualityModel.train(big, maxTrainRows = 50L)
    // still a usable model: scores real text above its shuffle on average
    val held = corpus(2000L until 2050L)
    val p = QualityModel.score(m1, held).agg(avg(col("quality_prob"))).head().getDouble(0)
    val n = QualityModel.score(m1, QualityModel.corrupt(held))
      .agg(avg(col("quality_prob"))).head().getDouble(0)
    assert(p > n, f"capped-fit model lost the signal: pos $p%.3f <= neg $n%.3f")
  }

  test("score() passes null-text docs through with null prob; bins come from the model") {
    val model = QualityModel.train(corpus(0L until 100L), bins = 1 << 12)
    val withNull = corpus(500L until 505L)
      .unionByName(Seq((999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    // scoring derives the feature width from the model (1<<12), so a
    // train/score bins mismatch cannot exist by construction
    val out = QualityModel.score(model, withNull).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out.size == 6) // no row vanished
    assert(out(999L).isEmpty) // null text -> explicit null verdict
    assert((500L until 505L).forall(i => out(i).exists(v => v >= 0 && v <= 1)))
  }
}
