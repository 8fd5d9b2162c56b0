package graft.near

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shingle CONTAINMENT (Broder, SEQUENCES '97): C(A,B) =
  * |S(A) ∩ S(B)| / |S(A)| — the ASYMMETRIC near-dup measure that
  * catches doc-inside-doc duplication (quoted articles, aggregator
  * pages, boilerplate-wrapped syndication) where symmetric Jaccard
  * is tiny because the container dwarfs the contained doc: a 50-line
  * article inside a 5000-line page has J ≈ 1% but
  * C(article → page) = 1. Dedup keep-policies treat high one-way
  * containment as "the small doc is redundant given the big one".
  *
  * This is the exact verify kernel over CANDIDATE pairs. At corpus
  * scale candidates must NOT come from MinHash banding — banding
  * thresholds on Jaccard, which size skew drives to 0, so it misses
  * exactly the pairs containment exists to find. The scale-path
  * candidate source is the winnowing-gram stage
  * (`SubstringDedup.crossDocRepeats`): the MOSS guarantee (any shared
  * run ≥ minLen shares a fingerprint) is size-skew-blind. The blocked
  * form below is the test/driver surface with the q_ngram_jaccard
  * two-sided cap; fractions are integer ppm (`DIV` floor, the
  * PageRank discipline) so the frame is oracle-exact.
  */
object Containment {

  /** (src, dst, c_src_ppm, c_dst_ppm) for every in-block pair, blocks
    * capped two-sided [capMin, capMax] BEFORE pairing (count →
    * semi-join — block growth cannot go quadratic); `setCol` is a
    * pre-materialized shingle/token array (materialize it ONCE per
    * row upstream — lambda bodies re-evaluate inlined trees).
    * Containment is a SET measure (Broder), so both the intersection
    * and the denominators are over DISTINCT elements — raw tokenized
    * text with repeats is fine to pass in (a multiset denominator
    * would understate C for any doc with repeated tokens and miss the
    * doc-inside-doc pairs the operator exists to catch). Null and
    * empty-set sides report 0 ppm, never 0/0 or a negative fraction.
    */
  def blockedContainment(d0: DataFrame, idCol: String,
      blockCols: Seq[String], setCol: String,
      capMin: Int = 2, capMax: Int = 100): DataFrame = {
    val bc = blockCols.map(col)
    val inCap = d0.groupBy(bc: _*).count()
      .filter(col("count").between(capMin, capMax)).select(bc: _*)
    val d = d0.join(inCap, blockCols, "left_semi")
      .withColumn("__set", array_distinct(
        coalesce(col(setCol), array().cast(d0.schema(setCol).dataType))))
    val l = d.select(bc :+ col(idCol).as("src") :+ col("__set").as("s1"): _*)
    val r = d.select(bc :+ col(idCol).as("dst") :+ col("__set").as("s2"): _*)
    l.join(r, blockCols)
      .filter(col("src") < col("dst"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("n1", size(col("s1")).cast("long"))
      .withColumn("n2", size(col("s2")).cast("long"))
      .select(col("src"), col("dst"),
        when(col("n1") > 0, expr("(inter * 1000000L) DIV n1"))
          .otherwise(lit(0L)).as("c_src_ppm"),
        when(col("n2") > 0, expr("(inter * 1000000L) DIV n2"))
          .otherwise(lit(0L)).as("c_dst_ppm"))
  }
}
