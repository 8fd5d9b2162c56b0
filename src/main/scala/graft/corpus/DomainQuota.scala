package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain document quota — the site-balancing cap (C4 / Dolma
  * release hygiene): no single domain may contribute more than `k`
  * documents to the mix, and the `k` kept are the BEST-scored ones
  * (ties broken by the deterministic md5 shuffle, so equal-scored
  * docs are sampled fairly rather than by id locality — the
  * [[BudgetSelect]] / [[Packing]] tie discipline).
  *
  * Scale shape — exact two-phase top-k, no unbounded per-domain sort:
  * a window partitioned by domain alone would sort a mega-domain's
  * whole membership in ONE task (the skew the salted drains exist
  * for). Instead:
  *
  *   1. phase 1 ranks within (domain, bucket) — bucket a hex prefix
  *      of the md5 order key, so a domain's docs spread uniformly
  *      over 16^hexChars bounded sort partitions — and keeps each
  *      bucket's local top-k. A doc cut here has k better docs in
  *      its OWN bucket, hence k better docs in its domain: provably
  *      outside the domain top-k, so phase 1 loses nothing (the
  *      classic distributed top-k argument).
  *   2. phase 2 re-ranks only the survivors — at most k·16^hexChars
  *      rows per domain, a CONSTANT-bounded frame — and keeps rank
  *      <= k.
  *
  * Returns the kept rows (id, domain, score, rank) — callers filter
  * by joining or use the frame directly as the balanced corpus.
  */
object DomainQuota {

  /** @param docs      input frame
    * @param domainCol grouping domain evaluated over `docs` (null
    *                  domains form their own capped group)
    * @param scoreCol  integer quality score (null ranks last)
    * @param k         max docs kept per domain (>= 1)
    * @param idCol     unique doc id column name
    * @param salt      tie-shuffle epoch key
    * @param hexChars  phase-1 bucket width (16^hexChars buckets)
    */
  def cap(docs: DataFrame, domainCol: Column, scoreCol: Column, k: Int,
      idCol: String = "id", salt: String = "", hexChars: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(hexChars >= 1 && hexChars <= 8, s"hexChars in [1,8]: $hexChars")
    val base = docs.select(
      col(idCol).as("id"),
      domainCol.as("domain"),
      scoreCol.cast("long").as("score"),
      md5(concat(lit(if (salt.isEmpty) "" else salt + ":"),
        col(idCol).cast("string")).cast("binary")).as("ord"))
      .withColumn("bucket",
        conv(substring(col("ord"), 1, hexChars), 16, 10).cast("long"))
    val order = Seq(col("score").desc_nulls_last, col("ord").asc, col("id").asc)
    val w1 = Window.partitionBy("domain", "bucket").orderBy(order: _*)
    val candidates = base
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
    val w2 = Window.partitionBy("domain").orderBy(order: _*)
    candidates
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("domain"), col("score"), col("rank"))
  }
}
