package graft.substring

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level dedup WITH TEXT RECONSTRUCTION — the CCNet-style policy
  * (Wenzek et al. LREC'20 dedup lines by hash across shards; C4 and
  * Dolma apply the same shape at span granularity). Complements
  * [[ChunkDedup]]: chunks are token tiles (boilerplate-span removal
  * at a fixed width), lines are the natural unit of web boilerplate
  * (nav bars, cookie banners, footers repeat as whole lines).
  * Reference analog: the whole-content identity stage (Files.pm
  * digest cascade) applied per line instead of per doc.
  *
  * Two policies:
  *   - [[dedupLines]]: keep each distinct non-blank line's globally
  *     FIRST occurrence (ordering (id, line index) — deterministic at
  *     any cluster size), remove later copies, including within one
  *     doc.
  *   - [[dropCommonLines]]: remove EVERY copy of a line appearing in
  *     ≥ minDocs distinct docs (the boilerplate rule — a line that
  *     common is noise even at its first occurrence).
  *
  * Blank/whitespace-only lines are structural, not content: they
  * never hash, are never removed, and reassembly preserves them
  * verbatim (paragraph breaks survive dedup).
  *
  * Scale shape (the ChunkDedup contract): line TEXT never rides a
  * shuffle — occurrences travel as (md5, id, idx) and the keeper
  * aggregation is a map-side-combinable min(struct) (md5, not a
  * 64-bit hash: 10^12+ distinct lines sit past the 64-bit birthday
  * bound, same reason CC uses string ids). Reconstruction re-splits
  * map-side and filters by the doc's own kept/removed index list
  * (≤ lines ints per doc on the join).
  */
object LineDedup {

  private def splitLines(textCol: String) =
    split(coalesce(col(textCol), lit("")), "\n")

  /** (id, idx, h): one row per NON-BLANK line occurrence. */
  private def occurrences(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).as("id"),
        posexplode(splitLines(textCol)).as(Seq("idx", "line")))
      .filter(trim(col("line")) =!= "")
      .select(col("id"), col("idx"), md5(col("line").cast("binary")).as("h"))

  /** Reassemble docs keeping line i ⟺ it is blank OR `keep(i)`;
    * null text passes through as null clean_text.
    */
  private def reassemble(docs: DataFrame, idxLists: DataFrame, listCol: String,
      keepWhenListed: Boolean, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(idxLists, Seq("id"), "left")
      .withColumn("lns", splitLines("text"))
      .withColumn("ix", coalesce(col(listCol), array().cast("array<int>")))
      .withColumn("clean_text",
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(array_join(filter(col("lns"), (x, i) =>
            trim(x) === "" ||
              (if (keepWhenListed) array_contains(col("ix"), i)
               else !array_contains(col("ix"), i))), "\n")))
      .select(col("id"), col("clean_text"))

  /** (id, clean_text): every non-blank line kept exactly once
    * corpus-wide, at its globally first (id, idx) occurrence.
    *
    * Reassembly filters by the REMOVED index list, not the kept one:
    * the per-line membership scan costs O(|list|) each, and for a
    * mostly-unique doc the removed list is tiny where the kept list
    * is every line — the kept-list form was O(lines²) per doc on
    * exactly the clean docs that dominate a corpus. Costs one extra
    * join of the (hash-sized) occurrence stream against the winners.
    */
  def dedupLines(docs: DataFrame, idCol: String = "url",
      textCol: String = "text"): DataFrame = {
    val occ = occurrences(docs, idCol, textCol)
    val winners = occ.groupBy(col("h"))
      .agg(min(struct(col("id"), col("idx"))).as("k"))
    val removed = occ.join(winners, "h")
      .filter(col("id") =!= col("k.id") || col("idx") =!= col("k.idx"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("idx"))).as("rm_idx"))
    reassemble(docs, removed, "rm_idx", keepWhenListed = false, idCol, textCol)
  }

  /** (id, clean_text) with every copy of a ≥-minDocs-docs line
    * removed. The doc-frequency count is exact, but the wide (h, id)
    * distinct shuffle runs only over lines that SURVIVE a
    * total-occurrence pre-filter (r4 VERDICT #8): occurrences ≥
    * distinct docs, so count(*) < minDocs PROVES df < minDocs — one
    * map-side-combinable aggregate sheds the unique-line mass (the
    * dominant fraction of a web corpus) with zero sketch error, which
    * is why this beats the approx_count_distinct variant the r4
    * verdict suggested: same shed, no HLL margin to reason about.
    * The candidate set is boilerplate-sized → broadcast join.
    */
  def dropCommonLines(docs: DataFrame, minDocs: Int = 10, idCol: String = "url",
      textCol: String = "text"): DataFrame = {
    val occ = occurrences(docs, idCol, textCol)
    val candidates = occ.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minDocs)
      .select(col("h"))
    val common = occ.join(candidates, "h").select(col("h"), col("id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("h"))
    val removed = occ.join(common, "h")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("idx"))).as("rm_idx"))
    reassemble(docs, removed, "rm_idx", keepWhenListed = false, idCol, textCol)
  }
}
