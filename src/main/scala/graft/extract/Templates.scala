package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Site-template detection via html STRUCTURE fingerprints — pages
  * that share a tag skeleton within a site are instances of one
  * template (listing pages, article shells, forum threads), the
  * structural complement of text-level boilerplate removal
  * ([[graft.substring.LineDedup]]): the template is invisible to
  * text dedup because every instance's TEXT differs, but the tag
  * sequence is identical. Downstream uses: per-template sampling
  * caps (don't let one shell's million instances dominate a crawl),
  * template-aware extraction, and site-section discovery.
  * Reference analog: none — [EXT], training-data ops.
  */
object Templates {

  /** Opening-tag-name pattern shared by engine and oracle (group 1 =
    * the tag name; closing tags, comments and doctypes don't match —
    * the skeleton is the open-tag sequence). RE2-safe.
    */
  val TagPattern: String = "<([a-zA-Z][a-zA-Z0-9]*)"

  /** md5 of the lowercased opening-tag-name sequence of an html
    * string — identical markup structure ⇒ identical fingerprint,
    * regardless of text content or attribute values (attributes are
    * not captured; tag case is normalized). Map-only, bytes never
    * shuffle on its account.
    */
  def structureFingerprint(html: Column): Column =
    md5(array_join(
      transform(
        regexp_extract_all(html.cast("string"), lit(TagPattern), lit(1)),
        t => lower(t)),
      ","))

  /** The template table: one (domain, structure_md5, n_pages,
    * min_doc) row per (registrable domain, structure fingerprint)
    * group with at least `minPages` instances — the site's template
    * inventory with a stable exemplar page per template. Map-side
    * fingerprint + ONE (domain, fp)-keyed agg (count and min are
    * both map-side combinable — a million-instance shell partial-
    * aggregates per task); singleton structures (one-off pages)
    * drop below `minPages`.
    */
  def templateClusters(docs: DataFrame, minPages: Long = 2,
      idCol: String = "doc_id", urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    require(minPages >= 1, s"minPages must be positive: $minPages")
    docs
      .select(col(idCol),
        graft.text.UrlNorm.registrableDomain(col(urlCol)).as("domain"),
        structureFingerprint(col(htmlCol)).as("structure_md5"))
      .filter(col("domain") =!= "")
      .groupBy(col("domain"), col("structure_md5"))
      .agg(count(lit(1)).as("n_pages"), min(col(idCol)).as("min_doc"))
      .filter(col("n_pages") >= minPages)
  }
}
