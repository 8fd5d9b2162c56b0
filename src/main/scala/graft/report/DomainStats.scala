package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-site corpus hygiene report — the crawl-operations view of a
  * webtext corpus: how many pages each registrable domain
  * contributes, how many of them are textually distinct, and the
  * byte mass — the table that drives per-domain sampling caps,
  * blocklist candidates (dup_docs ≈ n_docs ⇒ a mirror or a
  * boilerplate farm), and mixture weights at the site grain.
  * Reference analog: the summary-stats report (Files.pm) lifted to
  * the domain grain — [EXT].
  */
object DomainStats {

  /** (domain, n_docs, n_unique_texts, dup_docs, total_chars) per
    * registrable domain: `n_unique_texts` is the EXACT distinct
    * text count (by md5 — text itself never shuffles), `dup_docs`
    * the redundant remainder. One (domain)-grained aggregate;
    * the distinct count expands to a (domain, md5) partial-distinct
    * pass first — both phases map-side combine, so a million-page
    * mirror site collapses per task before the exchange.
    */
  def domainStats(docs: DataFrame, idCol: String = "doc_id",
      urlCol: String = "url", textCol: String = "text"): DataFrame =
    docs
      .select(
        graft.text.UrlNorm.registrableDomain(col(urlCol)).as("domain"),
        md5(coalesce(col(textCol), lit(""))).as("t_md5"),
        coalesce(length(col(textCol)), lit(0)).cast("long").as("n_chars"))
      .filter(col("domain") =!= "")
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("t_md5")).as("n_unique_texts"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("domain"), col("n_docs"), col("n_unique_texts"),
        (col("n_docs") - col("n_unique_texts")).as("dup_docs"),
        col("total_chars"))

  /** Cross-domain content sharing (mirror / syndication detection):
    * (d1, d2, shared_chunks) per registrable-domain pair with d1 < d2,
    * where `shared_chunks` counts DISTINCT non-overlapping `w`-token
    * chunk hashes appearing on both domains — the domain-pair view
    * `domainStats` cannot give (its dup_docs is within-domain).
    * High-shared pairs are mirror sites, syndication networks, or
    * scraper/origin relations; the chunk grain (not whole-doc md5)
    * catches partial mirrors whose pages differ only in navigation.
    *
    * Scale shape: text never shuffles — the chunker emits (domain,
    * 64-bit chunk hash) and everything downstream rides that pair.
    * The pair expansion is two-sided-capped like the n-gram Jaccard
    * verify: only chunks on [minDomains, maxDomains] distinct domains
    * contribute (a chunk on one domain pairs with nothing; a
    * universal boilerplate chunk on 10^5 domains would emit 10^10
    * pairs and says nothing about MIRRORING — cap callers re-filter
    * with the count gate if they need it). The gate runs BEFORE any
    * per-chunk domain set is collected, so aggregation buffers are
    * bounded by `maxDomains`, and per-pair output is at most
    * C(maxDomains, 2) rows per chunk. Exchanges: the (domain, hash)
    * distinct, the hash-keyed count gate reusing that partitioning,
    * and the final (d1, d2) count over a domains²-bounded key space.
    */
  def mirrorPairs(docs: DataFrame, w: Int = 20,
      urlCol: String = "url", textCol: String = "text",
      minDomains: Int = 2, maxDomains: Int = 20): DataFrame = {
    require(minDomains >= 2, s"minDomains >= 2: $minDomains")
    require(maxDomains >= minDomains, s"maxDomains >= minDomains: $maxDomains")
    val withDom = docs
      .select(graft.text.UrlNorm.registrableDomain(col(urlCol)).as("domain"),
        col(textCol).as("text"))
      .filter(col("domain") =!= "" && col("text").isNotNull)
    // stride = w: the chunker IS the tiling (ChunkDedup's policy);
    // id = domain, so the distinct collapses a domain's internal
    // repetition map-side before the exchange
    val dm = graft.substring.SubstringDedup
      .windowHashes(withDom, w, stride = w, idCol = "domain", textCol = "text")
      .select(col("id").as("domain"), col("win_hash"))
      .distinct()
    val eligible = dm.groupBy("win_hash")
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDomains && col("nd") <= maxDomains)
      .select("win_hash")
    val pairs = dm.join(eligible, Seq("win_hash"), "left_semi")
      .groupBy("win_hash")
      .agg(sort_array(collect_set(col("domain"))).as("ds"))
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("d1"), y.as("d2")))))).as("p"))
    pairs
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("shared_chunks"))
  }
}
