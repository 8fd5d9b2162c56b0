package graft.substring

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact-span removal WITH reconstruction — the full Lee et al.
  * (ACL'22 "Deduplicating Training Data Makes Language Models
  * Better") ExactSubstr removal policy, at ARBITRARY alignment
  * [EXT] (north rule; completes the tiled approximation of
  * [[ChunkDedup]], which can only cut on fixed 20-token tile
  * boundaries).
  *
  * Policy (single pass over the ORIGINAL corpus, not iterated to a
  * fixpoint — same as the reference policy): a character position p
  * of doc `d` is removed iff some window of length exactly `minLen`
  * containing p occurs verbatim in an EARLIER doc (id < d's id).
  * Because common-substring lengths are downward closed, this is
  * equivalent to "p lies inside a shared run of length ≥ minLen with
  * an earlier doc" — the first occurrence corpus-wide keeps the run,
  * every later occurrence is cut, regardless of alignment. Runs
  * repeated only WITHIN one doc are kept (cross-doc policy; the
  * within-doc case is [[SubstringDedup.suffixArrayRepeats]]'s job).
  *
  * Scale shape (the three-kernel plan prescribed by the round-4
  * verdict): winnowing fingerprints generate candidate doc pairs with
  * the MOSS guarantee — any shared run ≥ minLen shares a fingerprint
  * (k = minLen/2, s = minLen−k+1 ⇒ guarantee threshold k+s−1 =
  * minLen) — so the candidate set provably contains every pair the
  * policy needs; per-pair coverage is ONE rolling-hash pass over the
  * two texts (hash hits char-verified, so a 64-bit collision can
  * never cut good text); per-doc span merge is a small
  * intervals-only shuffle (texts never ride it). Hot boilerplate
  * grams are capped and surfaced as skip rows, same contract as every
  * other pairing stage (SCALE.md invariant 3).
  */
object SpanRemoval {

  /** Merged, disjoint, sorted [start, end) character spans of `b`
    * covered by some length-`minLen` substring of `b` that also
    * occurs in `a`. Rolling polynomial hash indexes `a`'s windows;
    * every hash hit while rolling over `b` is verified with a real
    * character comparison. O(|a| + |b|) hashing plus
    * O(matches · minLen) verification — the verify cost is
    * proportional to the duplicated mass, not the text size.
    */
  def coverage(a: String, b: String, minLen: Int): Array[(Int, Int)] = {
    if (a == null || b == null || a.length < minLen || b.length < minLen)
      return Array.empty
    val B = 0x100000001b3L
    var bk = 1L
    var i = 0
    while (i < minLen - 1) { bk *= B; i += 1 }
    // index a's minLen-gram mixed hashes -> start positions
    val byHash = new java.util.HashMap[Long, java.util.ArrayList[Int]]()
    var h = 0L
    i = 0
    while (i < minLen) { h = h * B + a.charAt(i); i += 1 }
    var p = 0
    var cont = true
    while (cont) {
      val key = graft.near.Hashing.mix64(h)
      var lst = byHash.get(key)
      if (lst == null) { lst = new java.util.ArrayList[Int](1); byHash.put(key, lst) }
      lst.add(p)
      if (p + minLen >= a.length) cont = false
      else { h = (h - a.charAt(p) * bk) * B + a.charAt(p + minLen); p += 1 }
    }
    // roll over b, merging covered windows on the fly
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var curS = -1
    var curE = -1
    var hb = 0L
    i = 0
    while (i < minLen) { hb = hb * B + b.charAt(i); i += 1 }
    var q = 0
    cont = true
    while (cont) {
      val cand = byHash.get(graft.near.Hashing.mix64(hb))
      var matched = false
      if (cand != null) {
        var c = 0
        while (!matched && c < cand.size) {
          if (a.regionMatches(cand.get(c), b, q, minLen)) matched = true
          c += 1
        }
      }
      if (matched) {
        if (curS >= 0 && q <= curE) curE = q + minLen
        else {
          if (curS >= 0) out += ((curS, curE))
          curS = q; curE = q + minLen
        }
      }
      if (q + minLen >= b.length) cont = false
      else { hb = (hb - b.charAt(q) * bk) * B + b.charAt(q + minLen); q += 1 }
    }
    if (curS >= 0) out += ((curS, curE))
    out.toArray
  }

  /** Merge already-sorted-per-source interval lists into disjoint
    * sorted spans.
    */
  def mergeSpans(all: Iterator[Array[(Int, Int)]]): Array[(Int, Int)] = {
    val flat = all.flatten.toArray.sortBy(_._1)
    if (flat.isEmpty) return flat
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var (cs, ce) = flat(0)
    var i = 1
    while (i < flat.length) {
      val (s, e) = flat(i)
      if (s <= ce) { if (e > ce) ce = e }
      else { out += ((cs, ce)); cs = s; ce = e }
      i += 1
    }
    out += ((cs, ce))
    out.toArray
  }

  /** Per-doc merged covered spans + over-cap skip rows:
    * (id, spans array<struct<_1,_2>>, skipped). Pair rows carry the
    * disjoint sorted [start, end) spans of doc `id` covered by runs
    * shared with ANY earlier candidate partner; the single null-id
    * row (if present) sums the rows of over-cap fingerprint buckets
    * whose candidate pairs were skipped (capped AND surfaced).
    *
    * One consumption of the winnow candidate pass: the groupBy
    * dedupes pair rows across fingerprints AND collapses skip rows in
    * the same small shuffle (the [[SubstringDedup.longRunEdgesAndSkips]]
    * shape). Texts are joined only onto candidate pairs; the span
    * merge shuffles intervals, never text.
    */
  def coveredSpansAndSkips(docs: DataFrame, minLen: Int = 60,
      idCol: String = "url", textCol: String = "text",
      maxDocsPerGram: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val raw = SubstringDedup.repeatCandidatesAndSkips(docs, minLen, idCol, textCol, maxDocsPerGram)
    val fused = raw.groupBy(col("src"), col("dst"))
      .agg(sum(col("skipped")).as("skipped"))
    val t = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    fused
      .join(t.select(col("id").as("src"), col("t").as("ta")), Seq("src"), "left")
      .join(t.select(col("id").as("dst"), col("t").as("tb")), Seq("dst"), "left")
      .select(col("src"), col("dst"), col("skipped"), col("ta"), col("tb"))
      .as[(String, String, Long, String, String)]
      .flatMap { case (src, dst, skipped, ta, tb) =>
        if (src == null) Iterator.single((null: String, Array.empty[(Int, Int)], skipped))
        else {
          // candidate pairs are emitted src < dst (sorted in the
          // drain), so src is the EARLIER doc: coverage cuts dst
          val cov = coverage(ta, tb, minLen)
          if (cov.isEmpty) Iterator.empty
          else Iterator.single((dst, cov, 0L))
        }
      }
      .groupByKey(_._1)
      .mapGroups { (id, rows) =>
        if (id == null) {
          var n = 0L
          rows.foreach(n += _._3)
          (id, Array.empty[(Int, Int)], n)
        } else (id, mergeSpans(rows.map(_._2)), 0L)
      }
      .toDF("id", "spans", "skipped")
  }

  /** (id, clean_text, n_removed): every covered span cut from the
    * text, remainder concatenated in order (the reconstruction side
    * of the policy). Docs with no shared runs pass through verbatim;
    * a fully-covered doc yields ""; null text passes through as null.
    * Pairs-only view — over-cap skips surface via
    * [[coveredSpansAndSkips]].
    */
  def removeSharedRuns(docs: DataFrame, minLen: Int = 60,
      idCol: String = "url", textCol: String = "text",
      maxDocsPerGram: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val spans = coveredSpansAndSkips(docs, minLen, idCol, textCol, maxDocsPerGram)
      .filter(col("id").isNotNull)
    docs.select(col(idCol).as("id"), col(textCol).as("t"))
      .join(spans.select(col("id"), col("spans")), Seq("id"), "left")
      .as[(String, String, Seq[(Int, Int)])]
      .map { case (id, t, sp) =>
        // null text passes through as null clean_text (the sibling
        // LineDedup/ChunkDedup convention): "" would be
        // indistinguishable from a fully-covered all-duplicate doc,
        // collapsing 'undecodable' into 'entirely boilerplate'
        if (t == null) (id, null: String, 0)
        else if (sp == null || sp.isEmpty) (id, t, 0)
        else {
          val sb = new java.lang.StringBuilder(t.length)
          var pos = 0
          var removed = 0
          sp.foreach { case (s, e) =>
            sb.append(t, pos, s)
            removed += e - s
            pos = e
          }
          sb.append(t, pos, t.length)
          (id, sb.toString, removed)
        }
      }
      .toDF("id", "clean_text", "n_removed")
  }
}
