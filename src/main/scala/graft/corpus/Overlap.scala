package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.near.Hashing

/** Cross-corpus n-gram overlap — the dataset-audit report that tells
  * you how much two crawl snapshots (or two sources feeding a mixture)
  * share before you pay for a full cross-corpus dedup pass: for every
  * source pair, the exact Jaccard similarity of their distinct
  * k-token-shingle sets (the overlap matrices of the Pile/Dolma-style
  * dataset papers, at shingle grain so partial textual reuse counts,
  * not just byte-identical pages).
  *
  * Two paths, one contract:
  *   - [[exactPairs]] — exact counts. One shuffle keyed on the shingle
  *     itself; per shingle the aggregation state is only the SET OF
  *     SOURCES containing it (bounded by the number of sources, a
  *     config-sized constant — never by corpus size), and the pair
  *     fan-out per shingle is ≤ S², so a 10^12-row corpus costs one
  *     map-side-combined distinct + one bounded aggregate. The S×S
  *     totals join is driver-trivial and broadcast.
  *   - [[sketches]] / [[estimatePairs]] — the MinHash estimate for
  *     when even the shingle shuffle is too much (routine audits over
  *     every snapshot pair): per source, the SAME 128-perm signature
  *     the near-dup stack uses ([[graft.near.Hashing.minhash]]
  *     semantics, unsigned min order), built declaratively so the
  *     shuffle carries only perms×S partial minima per map task
  *     (plain HashAggregate partials — no object-buffer udaf, no
  *     sort-fallback risk). Estimator = Broder signature agreement
  *     ([[graft.near.Hashing.sigEstimate]], stderr ≈ √(J(1−J)/128)).
  */
object Overlap {

  /** Distinct (source, shingle) pairs of the corpus: k-token shingles
    * over lowercased whitespace tokens. Tokens materialized before the
    * shingle lambda (SCALE.md invariant 7).
    */
  def sourceShingles(docs: DataFrame, k: Int = 3, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    // compiled shingle builder (r6): the transform/concat_ws HOF chain
    // was interpreted per window — identical space-joined strings
    val shUdf = udf((ts: Seq[String]) =>
      Array.tabulate(ts.length - (k - 1)) { i =>
        val sb = new java.lang.StringBuilder(64)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(ts(i + j))
          j += 1
        }
        sb.toString
      })
    docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(sourceCol).as("source"),
        graft.text.TextStats.tokens(lower(col(textCol))).as("ts"))
      .filter(size(col("ts")) >= k)
      .select(col("source"), explode(shUdf(col("ts"))).as("sh"))
      .distinct()
  }

  /** Exact pairwise overlap: one row per unordered source pair
    * (source_a < source_b) with distinct-shingle set sizes, the shared
    * count, and Jaccard. Pairs sharing nothing still appear (n_shared
    * = 0) — an audit that silently omits "no overlap" rows can't
    * distinguish them from "not measured".
    */
  def exactPairs(docs: DataFrame, k: Int = 3, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    // lazy checkpoint (r6): the shingle stream feeds two differently-
    // keyed groupBys (per-source totals, per-shingle source sets) —
    // unmaterialized, each exchange's map stage re-ran the tokenize+
    // k-gram pass; cached on first use
    val d = sourceShingles(docs, k, sourceCol, textCol).localCheckpoint(false)
    val tot = d.groupBy("source").agg(count(lit(1)).as("n"))
    // sources-per-shingle set (bounded by S), sorted, then the ordered
    // pair fan-out — flatten of per-prefix tails, no self-join back
    // onto the shingle stream
    val ss = d.groupBy("sh").agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    val pairs = ss.select(explode(flatten(transform(col("ss"),
        (a, i) => transform(slice(col("ss"), i + 2, size(col("ss"))),
          b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
      .select(col("p.source_a"), col("p.source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    val ta = tot.select(col("source").as("source_a"), col("n").as("n_a"))
    val tb = tot.select(col("source").as("source_b"), col("n").as("n_b"))
    ta.join(tb, col("source_a") < col("source_b"))
      .join(pairs, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_shared"), lit(0L))), 6)
          .as("jaccard"))
  }

  /** Per-source 128-perm MinHash sketch over the distinct-shingle set,
    * numerically identical to [[graft.near.Hashing.minhash]] on the
    * same set (so [[graft.near.Hashing.sigEstimate]] applies):
    * permutation p is x → a_p·x + b_p (odd a_p), min under UNSIGNED
    * order — columnar via the sign-bit flip (signed order of
    * v ^ Long.MinValue = unsigned order of v). The explode is map-side
    * and the (source, perm) partial minima combine before the shuffle,
    * so shuffle volume is perms × S per map task regardless of corpus
    * size.
    */
  def sketches(docs: DataFrame, k: Int = 3, perms: Int = 128, seed: Long = 42L,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    val a = Array.tabulate(perms)(p => Hashing.mix64(seed ^ (2L * p)) | 1L)
    val b = Array.tabulate(perms)(p => Hashing.mix64(seed ^ (2L * p + 1)))
    // a_p·x + b_p under JVM wrap-around (ANSI Column arithmetic would
    // throw on the intended 64-bit ring overflow), pre-flipped so the
    // columnar signed min IS the unsigned min
    val permVals = udf((x: Long) =>
      Array.tabulate(perms)(p => (a(p) * x + b(p)) ^ Long.MinValue))
    val signBit = lit(Long.MinValue)
    // the shingle-set member hash: xxhash64 of the joined lowercase
    // k-gram string — the sketch only needs SET semantics, and both
    // the sketch and the OverlapSpec cross-check hash the same way
    sourceShingles(docs, k, sourceCol, textCol)
      .select(col("source"), xxhash64(col("sh")).as("x"))
      .select(col("source"), posexplode(permVals(col("x"))).as(Seq("p", "vflip")))
      .groupBy("source", "p").agg(min(col("vflip")).as("vflip"))
      .groupBy("source")
      .agg(transform(array_sort(collect_list(struct(col("p"), col("vflip")))),
        e => e.getField("vflip").bitwiseXOR(signBit)).as("sig"))
  }

  /** Estimated pairwise Jaccard from [[sketches]]: one row per
    * unordered source pair with the Broder agreement estimate. The
    * pair join runs over S sketch rows — driver-scale however big the
    * corpus was.
    */
  def estimatePairs(docs: DataFrame, k: Int = 3, perms: Int = 128,
      seed: Long = 42L, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val est = udf((x: Seq[Long], y: Seq[Long]) =>
      Hashing.sigEstimate(x.toArray, y.toArray))
    val sk = sketches(docs, k, perms, seed, sourceCol, textCol)
    val a = sk.select(col("source").as("source_a"), col("sig").as("sig_a"))
    val b = sk.select(col("source").as("source_b"), col("sig").as("sig_b"))
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        round(est(col("sig_a"), col("sig_b")), 6).as("est_jaccard"))
  }
}
