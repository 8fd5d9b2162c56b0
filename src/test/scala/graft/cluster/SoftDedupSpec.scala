package graft.cluster

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  test("weights: 1e6 div cluster size, exact") {
    val assign = Seq(
      ("a", "c1"), ("b", "c1"), ("c", "c1"), // trio -> 333333
      ("d", "c2"),                           // singleton -> 1000000
      ("e", "c3"), ("f", "c3"))              // pair -> 500000
      .toDF("id", "component")
    val w = SoftDedup.weights(assign)
      .select("id", "n_members", "weight_micro")
      .as[(String, Long, Long)].collect()
      .map { case (k, n, m) => k -> ((n, m)) }.toMap
    assert(w == Map(
      "a" -> ((3L, 333333L)), "b" -> ((3L, 333333L)), "c" -> ((3L, 333333L)),
      "d" -> ((1L, 1000000L)),
      "e" -> ((2L, 500000L)), "f" -> ((2L, 500000L))))
  }

  test("per-cluster mass is within the floor-truncation band (1e6 - n, 1e6]") {
    val assign = (0 until 1000).map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "component")
    val mass = SoftDedup.weights(assign)
      .groupBy("component")
      .agg(count(lit(1)).as("n"), sum("weight_micro").as("m"))
      .as[(Long, Long, Long)].collect()
    mass.foreach { case (_, n, m) =>
      assert(m > 1000000L - n && m <= 1000000L, s"n=$n mass=$m")
    }
  }
}
