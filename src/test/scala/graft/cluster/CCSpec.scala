package graft.cluster

import graft.SparkSpec

class CCSpec extends SparkSpec {
  import spark.implicits._

  test("keep-best representatives: arg-max quality, min-id tie-break, map-side aggregate") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("g1", 10L, 0.5), ("g1", 7L, 0.9), ("g1", 3L, 0.9), // tie at 0.9 -> min id 3
      ("g2", 1L, 0.2),
      ("g3", 5L, 0.0), ("g3", 6L, 0.0)) // all-zero scores -> min id, +0.0 out
      .toDF("grp", "doc_id", "q")
    val reps = KeepBest.representatives(df, Seq("grp"), col("q"), "doc_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(reps == Map("g1" -> ((3L, 0.9)), "g2" -> ((1L, 0.2)), "g3" -> ((5L, 0.0))))
    assert(!reps.values.exists(v => v._2.equals(-0.0))) // no negative-zero leak
    val kept = KeepBest.markKept(df, Seq("grp"), col("q"), "doc_id")
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 1L, 5L))
  }

  test("keep-best works for string ids (url clusters) with zero-score groups") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("c1", "u-b", 0.4), ("c1", "u-a", 0.4), ("c1", "u-z", 0.1), // tie -> min url
      ("c2", "u-x", 0.0)) // zero score must emit +0.0, not -0.0
      .toDF("cid", "url", "q")
    val reps = KeepBest.representatives(df, Seq("cid"), col("q"), "url")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(reps == Map("c1" -> (("u-a", 0.4)), "c2" -> (("u-x", 0.0))))
    assert(java.lang.Double.doubleToRawLongBits(reps("c2")._2) == 0L) // bitwise +0.0
  }

  test("markKept keeps null-group rows (null-safe join back)") {
    import org.apache.spark.sql.functions._
    val df = Seq((Option("g"), 1L, 0.5), (Option.empty[String], 2L, 0.7),
      (Option.empty[String], 3L, 0.9)).toDF("grp", "doc_id", "q")
    val kept = KeepBest.markKept(df, Seq("grp"), col("q"), "doc_id")
    assert(kept.count() == 3) // null-group rows must not vanish
    assert(kept.filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("chain collapses to one component rooted at the min") {
    val e = Seq(("b", "a"), ("c", "b"), ("d", "c"), ("e", "d")).toDF("src", "dst")
    val cc = ConnectedComponents.run(e).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a", "e" -> "a"))
  }

  test("multiple components stay separate") {
    val e = Seq(("b", "a"), ("d", "c"), ("e", "d"), ("g", "f")).toDF("src", "dst")
    val cc = ConnectedComponents.run(e).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc("a") == "a" && cc("b") == "a")
    assert(cc("c") == "c" && cc("d") == "c" && cc("e") == "c")
    assert(cc("f") == "f" && cc("g") == "f")
  }

  test("cycle + duplicate + self-loop edges converge") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "b"), ("a", "a")).toDF("src", "dst")
    val cc = ConnectedComponents.run(e).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc.values.toSet == Set("a") && cc.keySet == Set("a", "b", "c"))
  }

  test("100k-member hub star converges without window skew (de-skewed min aggregate)") {
    import org.apache.spark.sql.functions._
    // one giant hub: every edge shares src "hub" — the shape that
    // stalled a single task under Window.partitionBy(src)
    val e = spark.range(100000)
      .select(concat(lit("n"), format_string("%06d", col("id"))).as("src"), lit("hub").as("dst"))
    val cc = ConnectedComponents.run(e)
    assert(cc.count() == 100001L)
    assert(cc.select("component").distinct().count() == 1L)
    assert(cc.select(min(col("component"))).head().getString(0) == "hub")
  }

  test("star graph is already converged") {
    val e = Seq(("z1", "a"), ("z2", "a"), ("z3", "a")).toDF("src", "dst")
    val cc = ConnectedComponents.run(e).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc.values.toSet == Set("a") && cc.size == 4)
  }
}
