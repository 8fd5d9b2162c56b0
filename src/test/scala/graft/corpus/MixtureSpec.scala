package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int) = (0 until n).map(i => (i.toLong, s"src${i % 4}"))
    .toDF("doc_id", "source")

  test("integer weights repeat exactly; zero weight drops; absent source passes through") {
    val out = Mixture.resample(mk(100),
        Map("src0" -> 0.0, "src1" -> 2.0, "src2" -> 3.0))
      .groupBy("source").agg(count(lit(1)).as("n"), max("copy_ix").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains("src0"), "weight 0 emits nothing")
    assert(out("src1") == ((50L, 1L)))
    assert(out("src2") == ((75L, 2L)))
    assert(out("src3") == ((25L, 0L)), "unlisted source defaults to weight 1")
  }

  test("fractional weights hit the expectation and are deterministic") {
    val docs = mk(4000) // 1000 per source
    val w = Map("src0" -> 0.25, "src1" -> 1.5, "src2" -> 0.0, "src3" -> 1.0)
    def counts() = Mixture.resample(docs, w)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = counts()
    assert(c == counts(), "re-run must be byte-identical")
    // binomial(1000, frac) around the mean; ±5 sigma bounds, no flake
    assert(c("src0") > 180 && c("src0") < 320, s"src0=${c("src0")}")
    assert(c("src1") > 1420 && c("src1") < 1580, s"src1=${c("src1")}")
    assert(!c.contains("src2"))
    assert(c("src3") == 1000L)
    // the fractional copy is always the LAST index (floor(w) full
    // passes, then the Bernoulli extra)
    val mx = Mixture.resample(docs, w).filter(col("source") === "src1")
      .groupBy("doc_id").agg(max("copy_ix").as("m")).select("m")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(mx.subsetOf(Set(0L, 1L)))
  }

  test("report: effective weight tracks the requested mixture") {
    val rep = Mixture.report(mk(4000), Map("src0" -> 2.25, "src1" -> 0.5))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .map(t => t._1 -> t).toMap
    assert(rep("src0")._2 == 1000L)
    assert(math.abs(rep("src0")._4 - 2.25) < 0.1)
    assert(math.abs(rep("src1")._4 - 0.5) < 0.1)
    assert(rep("src2")._3 == 1000L, "default weight 1 emits one epoch")
    intercept[IllegalArgumentException](
      Mixture.resample(mk(4), Map("src0" -> -1.0)))
  }
}
