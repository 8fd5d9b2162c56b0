package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r6 in-drain verify arithmetic (Ann.emitVerified) against
  * the Column form it replaced: round(cosineFromParts(...), 6) —
  * same left-to-right dot, same zero-norm guard, same HALF_UP round —
  * on adversarial vectors (near-ties at the 6th decimal, zero norms,
  * length mismatches, planted exact duplicates).
  */
class VerifyDrainSpec extends SparkSpec {
  import spark.implicits._

  test("in-drain cosine+round == Column round(cosineFromParts, 6)") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val vecs: Seq[(String, Seq[Double])] =
      (0 until 40).map { i =>
        val v =
          if (i % 7 == 0) Seq.fill(dim)(0.0) // zero norm → score 0.0
          else if (i % 5 == 0) (0 until dim).map(d => (d + 1).toDouble) // exact dups
          else (0 until dim).map(_ => rnd.nextGaussian())
        (f"id$i%03d", v)
      }
    val pre = vecs.map { case (id, v) =>
      (id, v, v.zip(v).map { case (a, b) => a * b }.sum)
    }
    // expected via the Column chain over all pairs
    val df = pre.toDF("id", "v", "nn")
    val l = df.select(col("id").as("src"), col("v").as("sv"), col("nn").as("sn"))
    val r = df.select(col("id").as("dst"), col("v").as("dv"), col("nn").as("dn"))
    val expected = l.join(r, col("src") < col("dst"))
      .select(col("src"), col("dst"),
        round(Ann.cosineFromParts(col("sv"), col("sn"), col("dv"), col("dn")), 6)
          .as("score"))
      .as[(String, String, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // kernel: one big bucket, threshold -2 keeps every pair
    val got = Ann.emitVerified(cap = 1000, threshold = -2.0)(
        pre.length.toLong, pre.toIndexedSeq)
      .map(t => (t._1, t._2) -> t._3.doubleValue).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(v == expected(k), s"pair $k") }
    // threshold filter operates on the ROUNDED score, as before
    val thr = expected.values.toSeq.sorted.apply(expected.size / 2)
    val kept = Ann.emitVerified(cap = 1000, threshold = thr)(
      pre.length.toLong, pre.toIndexedSeq).size
    assert(kept == expected.values.count(_ >= thr))
  }

  test("over-cap bucket emits exactly one counted skip row") {
    val ms = (0 until 5).map(i => (s"x$i", Seq(1.0, 0.0), 1.0)).toIndexedSeq
    val out = Ann.emitVerified(cap = 4, threshold = 0.0)(9L, ms).toList
    assert(out == List((null, null, null, 9L)))
  }
}
