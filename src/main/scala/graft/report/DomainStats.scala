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
}
