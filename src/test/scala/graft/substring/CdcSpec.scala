package graft.substring

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.substring.CdcChunks._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config(minSize = 32, maskBits = 6, maxSize = 256)

  private def rndBytes(seed: Long, n: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n); r.nextBytes(b); b
  }

  test("boundaries: deterministic, size-bounded, cover the payload exactly") {
    val b = rndBytes(1, 5000)
    val cuts = boundaries(b, cfg)
    assert(cuts.sameElements(boundaries(b.clone(), cfg)), "pure function of content")
    assert(cuts.last == b.length, "final cut ends the payload")
    val sizes = cuts.zip(0 +: cuts.dropRight(1).toSeq).map { case (e, s) => e - s }
    assert(sizes.forall(_ <= cfg.maxSize), "max size enforced")
    assert(sizes.dropRight(1).forall(_ >= cfg.minSize), "min size enforced (last chunk may be short)")
    // average near min + 2^maskBits (loose band: random content)
    val avg = b.length.toDouble / sizes.length
    assert(avg > cfg.minSize && avg < cfg.maxSize,
      s"average chunk $avg outside (${cfg.minSize}, ${cfg.maxSize})")
    assert(boundaries(Array.emptyByteArray, cfg).isEmpty)
    assert(boundaries(null, cfg).isEmpty)
  }

  test("insertion locality: an edit re-keys only nearby chunks; fixed tiling re-keys every later tile") {
    val base = rndBytes(2, 8000)
    val edited = base.take(500) ++ "INSERTED BYTES".getBytes(UTF_8) ++ base.drop(500)
    def hashes(b: Array[Byte]): Seq[String] = {
      val cuts = boundaries(b, cfg)
      var s = 0
      cuts.map { e =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(java.util.Arrays.copyOfRange(b, s, e))
        s = e
        h.map("%02x".format(_)).mkString
      }.toSeq
    }
    val (hb, he) = (hashes(base), hashes(edited))
    val shared = hb.toSet.intersect(he.toSet).size
    // CDC resynchronizes right after the edit: nearly all chunks shared
    assert(shared >= hb.size - 4,
      s"CDC must resync after one insertion: shared $shared of ${hb.size}")
    // the contrast: fixed 256-byte tiling shares NOTHING after byte 500
    def tiles(b: Array[Byte]): Seq[String] =
      b.grouped(256).map(t => java.util.Arrays.hashCode(t).toString).toSeq
    val tileShared = tiles(base).zip(tiles(edited)).count { case (a, c) => a == c }
    assert(tileShared <= 2, "fixed tiles diverge at and after the edit")
  }

  test("reconstruction from the deduped store is byte-exact; shared sections dedup") {
    val common = rndBytes(3, 3000)
    val docs = Seq(
      ("a", rndBytes(10, 700) ++ common ++ rndBytes(11, 900)),
      ("b", rndBytes(12, 1300) ++ common ++ rndBytes(13, 200)),
      ("c", rndBytes(14, 4000)),
      ("empty", Array.emptyByteArray),
      ("nul", null: Array[Byte])).toDF("id", "payload")
    val rows = chunkRows(docs, cfg).persist()
    val st = store(rows).persist()
    // dedup really happened: a + b share the common section's chunks
    val aH = rows.filter($"id" === "a").select("chunk_md5").as[String].collect().toSet
    val bH = rows.filter($"id" === "b").select("chunk_md5").as[String].collect().toSet
    assert(aH.intersect(bH).size >= common.length / cfg.maxSize - 2,
      "the 3000-byte shared section must share chunks despite different offsets")
    assert(st.count() == rows.select("chunk_md5").distinct().count())
    // byte-exact reassembly FROM THE STORE for every non-empty doc
    val rec = reconstruct(rows, st).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    val orig = docs.filter(length(col("payload")) > 0)
      .select(col("id"), md5(col("payload"))).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(orig.keySet == Set("a", "b", "c"))
    orig.foreach { case (id, m) => assert(rec(id) == m, s"doc $id") }
    // stats add up
    val s = stats(rows).collect().head
    assert(s.getLong(0) >= s.getLong(2), "total >= distinct")
    assert(s.getLong(4) == s.getLong(1) - s.getLong(3))
    assert(s.getLong(4) > 0, "the shared section saves bytes")
    rows.unpersist(); st.unpersist()
  }
}
