package graft.substring

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.near.Hashing

/** Exact substring deduplication [EXT] (north rule; the approach of
  * Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL'22 — suffix-array duplicate-substring detection,
  * re-shaped for Spark).
  *
  * Two complementary operators:
  *
  *  1. `duplicatedWindows` — the SCALE path: every w-token window is
  *     hashed map-side (content hash of the window); a single groupBy
  *     finds windows occurring in ≥2 documents. Pure
  *     shuffle-of-hashes, linear in corpus size, no cross-partition
  *     coordination — this is what runs at 10^12 docs.
  *
  *  2. `suffixArrayRepeats` — partition-local exact maximal repeats
  *     via a per-partition suffix array over the concatenated docs
  *     (`mapPartitions`, the sanctioned last resort for genuinely
  *     non-relational per-partition logic). Finds repeats of ANY
  *     length ≥ minLen within a partition; pair with a content-hash
  *     `repartition` so near-identical docs co-locate.
  */
object SubstringDedup {

  private val Sep = '\u0000' // sentinel: never occurs in extracted text

  /** (id, win_pos, win_hash) for every w-token window (stride s). */
  def windowHashes(docs: DataFrame, w: Int = 20, stride: Int = 10,
      idCol: String = "url", textCol: String = "text"): DataFrame = {
    val winUdf = udf { (text: String) =>
      val toks = Hashing.tokenize(text)
      if (toks.length < w) Array.empty[Long]
      else Array.range(0, (toks.length - w) / stride + 1).map { i =>
        var h = 0x9e3779b97f4a7c15L
        var j = 0
        while (j < w) {
          val tok = toks(i * stride + j)
          var sh = 0xcbf29ce484222325L
          var p = 0
          while (p < tok.length) { sh = (sh ^ tok.charAt(p)) * 0x100000001b3L; p += 1 }
          h = Hashing.mix64(h ^ sh ^ j.toLong)
          j += 1
        }
        h
      }
    }
    docs.select(col(idCol).as("id"), posexplode(winUdf(col(textCol)))
      .as(Seq("win_pos", "win_hash")))
  }

  /** Duplicated w-token windows: win_hash groups spanning ≥2 distinct
    * docs. Output (win_hash, n_docs, doc_ids sample).
    */
  def duplicatedWindows(docs: DataFrame, w: Int = 20, stride: Int = 10,
      idCol: String = "url", textCol: String = "text", sampleDocs: Int = 20): DataFrame =
    windowHashes(docs, w, stride, idCol, textCol)
      .groupBy("win_hash")
      .agg(
        countDistinct(col("id")).as("n_docs"),
        slice(sort_array(collect_set(col("id"))), 1, sampleDocs).as("doc_ids"))
      .filter(col("n_docs") >= 2)

  /** Docs sharing ≥ minShared duplicated windows → dup edges
    * (src < dst). Hot boilerplate windows are capped at 50 docs per
    * window (quadratic-blowup guard, SURVEY §7.3).
    */
  def substringDupEdges(docs: DataFrame, w: Int = 20, stride: Int = 10,
      minShared: Int = 2, idCol: String = "url", textCol: String = "text",
      maxDocsPerWindow: Int = 50): DataFrame = {
    val wh = windowHashes(docs, w, stride, idCol, textCol)
    // capped-set aggregation: at most cap+1 distinct ids accumulate
    // per window — a hot boilerplate window never materializes its
    // full doc set, in ONE pass (SURVEY §7.3, SCALE.md invariant 3)
    val grouped = wh.groupBy("win_hash")
      .agg(graft.functions.CappedCollect.stringSet(col("id"), maxDocsPerWindow).as("cc"))
      .filter(col("cc.n").between(2, maxDocsPerWindow))
      .select(col("win_hash"), col("cc.items").as("ids"))
    grouped
      .select(explode(col("ids")).as("src"), col("ids"))
      .select(col("src"), explode(col("ids")).as("dst"))
      .filter(col("src") < col("dst"))
      .groupBy("src", "dst").count()
      .filter(col("count") >= minShared)
      .select(col("src"), col("dst"), col("count").as("shared_windows"))
  }

  case class Repeat(srcDoc: String, dstDoc: String, length: Int, sample: String)

  /** Partition-local maximal repeated substrings ≥ minLen chars across
    * ≥2 docs, via a per-partition suffix array (sorted suffixes, LCP
    * of neighbors).
    */
  def suffixArrayRepeats(spark: SparkSession, docs: DataFrame, minLen: Int = 60,
      idCol: String = "url", textCol: String = "text",
      maxPartitionChars: Int = 2000000): Dataset[Repeat] = {
    import spark.implicits._
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val rows = it.filter(r => r._2 != null && r._2.length >= minLen).toArray
        if (rows.length < 2) Iterator.empty
        else {
          val sb = new StringBuilder
          val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
          rows.foreach { case (id, t) =>
            if (sb.length < maxPartitionChars) {
              bounds += ((sb.length, id)); sb.append(t).append(Sep)
            }
          }
          val s = sb.toString
          val n = s.length
          def docOf(pos: Int): String = {
            var lo = 0; var hi = bounds.length - 1
            while (lo < hi) {
              val mid = (lo + hi + 1) >>> 1
              if (bounds(mid)._1 <= pos) lo = mid else hi = mid - 1
            }
            bounds(lo)._2
          }
          val sa = Array.range(0, n).filter(i => s.charAt(i) != Sep)
            .sortWith((a, b) => compareSuffix(s, a, b) < 0)
          val out = scala.collection.mutable.ArrayBuffer.empty[Repeat]
          var i = 1
          while (i < sa.length) {
            val a = sa(i - 1); val b = sa(i)
            val l = lcp(s, a, b, minLen + 256)
            if (l >= minLen) {
              val da = docOf(a); val db = docOf(b)
              if (da != db)
                out += Repeat(
                  if (da < db) da else db, if (da < db) db else da,
                  l, s.substring(a, a + math.min(80, l)))
            }
            i += 1
          }
          out.groupBy(r => (r.srcDoc, r.dstDoc)).map(_._2.maxBy(_.length)).iterator
        }
      }
  }

  private def compareSuffix(s: String, a0: Int, b0: Int): Int = {
    var i = a0; var j = b0
    val n = s.length
    while (i < n && j < n) {
      val ca = s.charAt(i); val cb = s.charAt(j)
      if (ca != cb) return ca - cb
      if (ca == Sep) return 0
      i += 1; j += 1
    }
    (n - a0) - (n - b0)
  }

  private def lcp(s: String, a: Int, b: Int, cap: Int): Int = {
    var l = 0
    val n = s.length
    while (a + l < n && b + l < n && l < cap &&
      s.charAt(a + l) == s.charAt(b + l) && s.charAt(a + l) != Sep) l += 1
    l
  }
}
