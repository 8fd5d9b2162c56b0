package graft.cluster

import graft.SparkSpec

class CCSpec extends SparkSpec {
  import spark.implicits._

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

  test("star graph is already converged") {
    val e = Seq(("z1", "a"), ("z2", "a"), ("z3", "a")).toDF("src", "dst")
    val cc = ConnectedComponents.run(e).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc.values.toSet == Set("a") && cc.size == 4)
  }
}
