package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormSpec extends SparkSpec {

  test("dedupNfc: canonical-equivalent texts cluster, byte-distinct stays apart") {
    import spark.implicits._
    val pre = "café menu" // precomposed e-acute
    val dec = "café menu" // e + combining acute: NFC-equal, md5-distinct
    val d = Seq(
      (1L, pre), (2L, dec), (3L, "cafe menu"), (4L, pre + "!"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(pre != dec && pre.length != dec.length) // sanity: byte-distinct pair
    val out = UnicodeNorm.dedupNfc(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L)) // null text dropped
  }

  test("scriptMix: exact ppm floor division per literal-range class") {
    import spark.implicits._
    val d = Seq(
      (1L, "abc Привет"), // "abc Привет": len 10
      (2L, ""),
      (3L, "日本語"), // CJK only, len 3
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = UnicodeNorm.scriptMix(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // null dropped
    val r1 = out(1L)
    assert(r1.getAs[Long]("len") == 10)
    assert(r1.getAs[Long]("latin_ppm") == 300000L) // 3 of 10
    assert(r1.getAs[Long]("cyrillic_ppm") == 600000L) // 6 of 10
    assert(r1.getAs[Long]("cjk_ppm") == 0L)
    assert(out(2L).getAs[Long]("latin_ppm") == 0L) // empty: 0, not 0/0
    assert(out(3L).getAs[Long]("cjk_ppm") == 1000000L)
    // floor, not rounding: 1 of 3 chars = 333333 exactly
    val one = UnicodeNorm.scriptMix(Seq((9L, "aЖЖ")).toDF("doc_id", "text"))
      .head()
    assert(one.getAs[Long]("latin_ppm") == 333333L)
    assert(one.getAs[Long]("cyrillic_ppm") == 666666L)
  }
}
