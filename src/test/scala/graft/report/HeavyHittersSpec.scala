package graft.report

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra-Gries candidate guarantee, count-min overestimate + merge
  * exactness, and the thresholded-exact end-to-end contract.
  */
class HeavyHittersSpec extends SparkSpec {

  private def skewedKeys(n: Int): Seq[String] =
    // geometric skew: key "k<j>" for j = bit length of (i % 1024)
    (0 until n).map(i => "k" + (64 - java.lang.Long.numberOfLeadingZeros(i % 1024 | 0L)).max(1))

  test("Misra-Gries: every key with count > n/(m+1) is in the summary; size <= m") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 20) {
      val n = 500 + rnd.nextInt(2000)
      val m = 1 + rnd.nextInt(12)
      val stream = Seq.fill(n)("w" + (rnd.nextInt(rnd.nextInt(40) + 1))) // skewed-ish
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val summary = HeavyHitters.misraGries(stream.iterator, m)
      assert(summary.size <= m)
      val mustHave = truth.filter { case (_, c) => c > n.toDouble / (m + 1) }.keySet
      assert(mustHave.subsetOf(summary.keySet),
        s"missing ${mustHave -- summary.keySet} at n=$n m=$m")
    }
  }

  test("count-min: probe overestimates every key; register merge == grid of the union") {
    import spark.implicits._
    val a = skewedKeys(3000).toDF("key")
    val b = skewedKeys(1500).map("x" + _).toDF("key")
    val d = 3; val w = 64
    val merged = HeavyHitters.mergeRegisters(
      HeavyHitters.registers(a, col("key"), d, w),
      HeavyHitters.registers(b, col("key"), d, w))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = HeavyHitters.registers(a.union(b), col("key"), d, w)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == direct)

    val union = a.union(b)
    val exact = union.groupBy("key").count()
    val est = HeavyHitters.probe(exact, HeavyHitters.registers(union, col("key"), d, w), d, w)
    val bad = exact.join(est, "key").filter(col("est") < col("count")).count()
    assert(bad == 0L, "count-min must never underestimate")
  }

  test("heavyHitters == exact thresholded top set, invariant to partitioning") {
    import spark.implicits._
    val df = skewedKeys(20480).toDF("key")
    val m = 20
    val n = 20480L
    val expected = df.groupBy("key").count()
      .filter(col("count") > n / (m + 1))
      .orderBy(col("count").desc, col("key"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty && expected.size < 11) // fixture really is selective
    for (parts <- Seq(1, 7)) {
      val got = HeavyHitters.heavyHitters(df.repartition(parts), col("key"), m)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expected, s"at $parts partitions")
    }
  }
}
