package graft.substring

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-level exact dedup WITH TEXT RECONSTRUCTION — the REMOVAL
  * policy of Lee et al. ACL'22 (their suffix-array pipeline cuts the
  * duplicated spans out of the corpus; linking docs, as the edge
  * stages do, is only half of the operator a training-data pipeline
  * needs), in the non-overlapping-tiling form that scales as pure
  * relational dataflow:
  *
  *  - each doc's token stream is tiled into consecutive w-token
  *    chunks (the < w-token tail is always kept);
  *  - a chunk SURVIVES iff it is the globally FIRST occurrence of its
  *    content (ordering: (id, chunk index) ascending — deterministic
  *    and cluster-size-independent), so exact duplicated spans are
  *    kept exactly once corpus-wide, including within one doc;
  *  - each doc's surviving chunks + tail are reassembled into
  *    `clean_text` (whitespace-normalized: tokens joined by single
  *    spaces — tokenization is the declared equivalence).
  *
  * Scale shape: the only wide ops are a (hash → min(id, idx))
  * aggregation (map-side combinable) and the kept-index join back —
  * chunk TEXT never rides a shuffle (hashes only); reconstruction is
  * a map-side HOF over the doc's own tokens with the kept-index list
  * (≤ tokens/w ints per doc). Tiling (stride = w) is what makes
  * removal relational: overlapping-window removal needs span
  * merging, which is exactly the per-partition suffix-array path
  * (`suffixArrayRepeats`) — this operator is the 10^12-doc policy.
  */
object ChunkDedup {

  /** (id, clean_text) for every input row (null text passes through
    * as null clean_text). See object doc for semantics.
    */
  def dedupChunks(docs: DataFrame, w: Int = 20, idCol: String = "url",
      textCol: String = "text"): DataFrame = {
    // (id, idx, hash) per full chunk — windowHashes with stride = w IS
    // the tiling, and its hash is position-independent content hash.
    // The keeper aggregation's min-struct row IS the surviving
    // occurrence, so no join back onto the occurrence stream is needed
    // at all: one corpus scan, a map-side-combining min (a 10M-copy
    // boilerplate chunk partial-aggregates instead of sorting in one
    // task — SCALE.md invariant 5), then a re-key of the one-row-per-
    // distinct-chunk keepers by doc.
    val kept = SubstringDedup.windowHashes(docs, w, stride = w, idCol, textCol)
      .groupBy(col("win_hash"))
      .agg(min(struct(col("id"), col("win_pos"))).as("k"))
      .groupBy(col("k.id").as("id"))
      .agg(sort_array(collect_list(col("k.win_pos"))).as("kept_idx"))

    // reconstruction MUST tokenize exactly like the hashing side
    // (Hashing.tokenize = Java String.trim — strips ALL chars
    // <= U+0020 — then \s+ split): Spark's trim() strips spaces only
    // and split() keeps a trailing empty token after a trailing
    // separator, so "a b\n" would reconstruct with a phantom token,
    // shifting every tile and silently cutting the wrong spans
    // (round-4 review finding #1). The char class is [\x00-\x20], not
    // \s, for exact String.trim parity on control-char edges.
    // compiled (r6): the transform/slice/flatten HOF chain evaluated
    // an interpreted lambda per kept tile; the kernel emits the
    // identical string in one pass (pinned against the retained
    // expression form by the suite)
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        reconstructKernel(w)(col("text"), col("kept_idx")).as("clean_text"))
  }

  private[graft] def reconstructKernel(w: Int) = {
    val wsPattern = java.util.regex.Pattern.compile("\\s+")
    udf((text: String, ki: Seq[Int]) =>
      if (text == null) null
      else {
        // Java String.trim == the [\x00-\x20] edge strip above
        val ft = text.trim
        val toks: Array[String] =
          if (ft.isEmpty) Array.empty[String] else wsPattern.split(ft, -1)
        val nc = toks.length / w
        val sb = new java.lang.StringBuilder
        var first = true
        def appendRange(from: Int, until: Int): Unit = {
          var j = from
          val e = math.min(until, toks.length)
          while (j < e) {
            if (!first) sb.append(' ')
            sb.append(toks(j))
            first = false
            j += 1
          }
        }
        if (ki != null) ki.foreach(i => appendRange(i * w, i * w + w))
        appendRange(nc * w, toks.length)
        sb.toString
      })
  }

  /** The ORIGINAL expression-chain reconstruction, retained for the
    * kernel-pinning compare in the test suite.
    */
  private[graft] def reconstructExpr(docs: DataFrame, kept: DataFrame, w: Int,
      idCol: String, textCol: String): DataFrame = {
    val fullTrim = regexp_replace(coalesce(col(textCol), lit("")),
      "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")
    val toks = when(fullTrim === "", array().cast("array<string>"))
      .otherwise(split(fullTrim, "\\s+"))
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(kept, Seq("id"), "left")
      .withColumn("toks", toks)
      .withColumn("nc", (size(col("toks")) / w).cast("int"))
      // null kept_idx means either "doc had no full chunks" (nc = 0 —
      // nothing to remove) or "every chunk was a later duplicate"
      // (nc > 0 — remove them all); coalesce to empty covers both
      .withColumn("ki", coalesce(col("kept_idx"), array().cast("array<int>")))
      .withColumn("clean_text",
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ",
            flatten(concat(
              transform(col("ki"), i => slice(col("toks"), i * w + 1, lit(w))),
              array(slice(col("toks"), col("nc") * w + 1,
                greatest(size(col("toks")) - col("nc") * w, lit(0)))))))))
      .select(col("id"), col("clean_text"))
  }
}
