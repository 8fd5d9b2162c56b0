package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("bucket is the md5-prefix u32 (pinned to an independent reference value)") {
    // hashlib.md5(b"grafthello world").hexdigest()[:8] = 32445e73 = 843341427
    val b = Seq("hello world").toDF("k")
      .select(Splits.bucket(col("k"), "graft").as("b")).head().getLong(0)
    assert(b == 843341427L)
  }

  test("thresholds: exact integer boundaries, last split absorbs the remainder") {
    val ts = Splits.thresholds(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(ts == Seq("train" -> 3435973836L, "val" -> 3865470566L, "test" -> 4294967296L))
    intercept[IllegalArgumentException](Splits.thresholds(Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](Splits.thresholds(Nil))
    intercept[IllegalArgumentException](Splits.thresholds(Seq("a" -> 1.2, "b" -> -0.2)))
  }

  test("byFingerprint: exact/near-identical texts NEVER straddle a split (the leakage guarantee)") {
    // 300 distinct texts, each planted 3 times with whitespace/case noise
    // (same normalized fingerprint); every triple must land together
    val rows = (0 until 300).flatMap { i =>
      val base = s"document $i body ${"tok " * 5}end"
      Seq((i * 3 + 0L, base), (i * 3 + 1L, "  " + base.toUpperCase + " "),
        (i * 3 + 2L, base.replace(" ", "\t\t")))
    }
    val out = Splits.byFingerprint(rows.toDF("doc_id", "text"))
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 300).foreach { i =>
      val s = Set(out(i * 3L), out(i * 3 + 1L), out(i * 3 + 2L))
      assert(s.size == 1, s"group $i straddles: $s")
    }
    // and the split proportions are in the right ballpark (binomial
    // over 300 group coin-flips; wide tolerance, zero flake budget)
    val byName = (0 until 300).groupBy(i => out(i * 3L)).view.mapValues(_.size).toMap
    assert(byName.getOrElse("train", 0) > 180 && byName.getOrElse("train", 0) < 290)
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
  }

  test("byAssignment: a near-dup cluster follows its component, absentees hash alone") {
    val docs = Seq(("u1", "a"), ("u2", "b"), ("u3", "c"), ("u9", "d"))
      .toDF("url", "text")
    val assign = Seq(("u1", "u1"), ("u2", "u1"), ("u3", "u3")).toDF("id", "component")
    val out = Splits.byAssignment(docs, assign).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("u1") == out("u2"), "same component, same split")
    // u9 is absent from the assignment: deterministic singleton hash
    val alone = Seq(("u9", "whatever")).toDF("url", "text")
    val out2 = Splits.byAssignment(alone, assign.limit(0)).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out2("u9") == out("u9"), "absent id splits by its own hash, not by row context")
  }

  test("splitColumn is pure and salt-sensitive (re-runs agree, salts shear)") {
    val d = (0 until 200).map(i => s"key$i").toDF("k")
    def splits(salt: String) = d.select(col("k"),
        Splits.splitColumn(col("k"), Seq("a" -> 0.5, "b" -> 0.5), salt).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(splits("s1") == splits("s1"))
    assert(splits("s1") != splits("s2"), "different salt must reshuffle some keys")
  }
}
