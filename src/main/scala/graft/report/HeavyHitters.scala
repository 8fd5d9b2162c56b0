package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Heavy-hitter detection over an unbounded key space — the frequency
  * complement of the [[Cardinality]] distinct-count audit: "which
  * boilerplate lines / shingles / domains carry the duplicated mass"
  * without a corpus-wide groupBy on the key. Reference analog: none —
  * [EXT], training-data ops (the question Engine.pm's collision
  * metrics answer per digest level, asked of raw content).
  *
  * Two mergeable summaries compose into an EXACT thresholded answer:
  *
  *   - Misra-Gries (1982) per partition, `m` counters: any key with
  *     partition count > n_p/(m+1) survives that partition's summary,
  *     so a key with GLOBAL count > N/(m+1) survives in at least one
  *     partition (pigeonhole over the sum) — the union of summaries is
  *     a guaranteed candidate SUPERSET, ≤ m·partitions keys.
  *   - Count-min sketch (Cormode-Muthukrishnan 2005): d portable-hash
  *     rows × w buckets of exact Long sums — register-wise mergeable
  *     and reduction-order-exact (sums of nonnegative ints), so
  *     snapshots persist the grid and incremental batches fold in
  *     register-wise, the [[Cardinality.mergeRegisters]] discipline.
  *     A probe overestimates by construction: exact ≤ est.
  *
  * [[heavyHitters]] then EXACT-counts only the candidate keys (the
  * shuffle carries candidate rows alone, a broadcast semi-join gate)
  * and keeps keys with count strictly above floor(N/(m+1)) — since
  * floor(x)+1 > x, every kept key is inside the Misra-Gries guarantee,
  * making the output the exact, deterministic, partitioning-invariant
  * set "all keys with count > N/(m+1)" no matter which extra
  * candidates the per-partition summaries happened to carry.
  *
  * Portability: bucket_r(key) = md5-hex-prefix long of "r:key" mod w
  * ([[Hashing.hexPrefixLong]]) — the oracle replays the identical
  * grid, probe, and threshold in SQL (q_heavy_hitters).
  *
  * Scale shape: MG is one mapPartitions pass (O(m) state); the CMS
  * grid shuffles ≤ d·w rows per partition after map-side combine; the
  * exact count shuffles only candidate-key rows; nothing else leaves
  * the map side. At 10^12 docs the full-width alternative
  * (`groupBy(key).count` then top-k) shuffles every key instance.
  */
object HeavyHitters {

  /** Misra-Gries summary of one stream: at most `m` (key, counter)
    * entries; every key with count > n/(m+1) is present. Counters
    * UNDERestimate true counts (by at most n/(m+1)) — they gate
    * candidacy, never report.
    */
  def misraGries(it: Iterator[String], m: Int): collection.Map[String, Long] = {
    require(m >= 1, s"m must be >= 1: $m")
    val counters = new java.util.HashMap[String, Long](m * 2)
    it.foreach { k =>
      // live counters are always >= 1 (zeros are removed), so the
      // 0L default safely means "absent" — no boxed-null unboxing
      val c = counters.getOrDefault(k, 0L)
      if (c > 0L) counters.put(k, c + 1L)
      else if (counters.size < m) counters.put(k, 1L)
      else {
        // decrement-all; drop zeros (the classic O(m) amortized step)
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.asScala
  }

  private def bucketOf(r: Column, key: Column, w: Int): Column =
    Hashing.hexPrefixLong(
      concat(r.cast("string"), lit(":"), key).cast("binary"), 15) % lit(w.toLong)

  /** The count-min register grid of `keyCol` (nulls skipped):
    * (r, b, cnt) with r in [0, d), b in [0, w) — ≤ d·w rows after
    * map-side combine, ready to persist or [[mergeRegisters]].
    */
  def registers(df: DataFrame, keyCol: Column, d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2: d=$d w=$w")
    df.filter(keyCol.isNotNull)
      .select(keyCol.as("key"))
      .select(col("key"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), bucketOf(col("r"), col("key"), w).as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Register-wise sum of two grids (same d/w) — the incremental-batch
    * fold; exact because counts are nonnegative Long sums.
    */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "b").agg(sum("cnt").as("cnt"))

  /** Count-min probe of candidate keys against a register grid:
    * (key, est) with est = min over rows of the key's bucket —
    * exact ≤ est by construction. `cands` needs a `key` column.
    */
  def probe(cands: DataFrame, regs: DataFrame, d: Int = 4, w: Int = 1024): DataFrame =
    cands.select(col("key"))
      .select(col("key"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("b", bucketOf(col("r"), col("key"), w))
      .join(regs, Seq("r", "b"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** All keys with exact count strictly above floor(N/(m+1)), with the
    * CMS estimate riding along: (key, cnt, est), cnt descending then
    * key. Deterministic and partitioning-invariant (scaladoc above).
    */
  def heavyHitters(df: DataFrame, keyCol: Column, m: Int = 64,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE materialization serves the count, the MG pass, the gated
    // exact count, and the register grid; localCheckpoint (not
    // persist) so no cached frame outlives the call (the pipeline
    // discipline) and the upstream DAG executes exactly once. Lazy
    // (r6): the count() right below materializes it — eager was a
    // redundant extra blocking job.
    val keys = df.filter(keyCol.isNotNull).select(keyCol.as("key")).localCheckpoint(false)
    val n = keys.count()
    val cands = keys.as[String]
      .mapPartitions(it => misraGries(it, m).keysIterator)
      .toDF("key").distinct()
    val exact = keys.join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(n / (m + 1)))
    exact
      .join(probe(exact, registers(keys, col("key"), d, w), d, w), Seq("key"))
      .orderBy(col("cnt").desc, col("key"))
  }
}
