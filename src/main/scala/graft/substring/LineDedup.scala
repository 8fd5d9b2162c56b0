package graft.substring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unit-level dedup WITH TEXT RECONSTRUCTION at a caller-chosen
  * separator — the CCNet-style policy (Wenzek et al. LREC'20 dedup
  * lines by hash across shards; C4 and Dolma apply the same shape at
  * span granularity) at LINE grain ("\n", web boilerplate's natural
  * unit: nav bars, cookie banners, footers repeat as whole lines) and
  * PARAGRAPH grain ("\n\n" blank-line-delimited blocks — the grain
  * Dolma's paragraph dedup runs at, Soldaini et al. 2024 §2.2, here
  * as an exact computation rather than Dolma's Bloom approximation).
  * Complements [[ChunkDedup]]: chunks are token tiles (boilerplate-
  * span removal at a fixed width). Reference analog: the
  * whole-content identity stage (Files.pm digest cascade) applied per
  * unit instead of per doc.
  *
  * Two policies per grain:
  *   - [[dedupLines]]/[[dedupParagraphs]] ([[dedupUnits]]): keep each
  *     distinct non-blank unit's globally FIRST occurrence (ordering
  *     (id, unit index) — deterministic at any cluster size), remove
  *     later copies, including within one doc.
  *   - [[dropCommonLines]]/[[dropCommonParagraphs]]
  *     ([[dropCommonUnits]]): remove EVERY copy of a unit appearing
  *     in ≥ minDocs distinct docs (the boilerplate rule — a unit
  *     that common is noise even at its first occurrence).
  *
  * Blank/whitespace-only units are structural, not content: they
  * never hash, are never removed, and reassembly preserves them
  * verbatim (a lone "\n" between two paragraph breaks survives
  * paragraph dedup exactly as blank lines survive line dedup).
  *
  * Scale shape (the ChunkDedup contract): unit TEXT never rides a
  * shuffle — occurrences travel as (md5, id, idx) and the keeper
  * aggregation is a map-side-combinable min(struct) (md5, not a
  * 64-bit hash: 10^12+ distinct units sit past the 64-bit birthday
  * bound, same reason CC uses string ids). Reconstruction re-splits
  * map-side and filters by the doc's own kept/removed index list
  * (≤ units ints per doc on the join).
  */
object LineDedup {

  private def splitUnits(textCol: String, sep: String) =
    split(coalesce(col(textCol), lit("")), java.util.regex.Pattern.quote(sep))

  /** Whitespace-only test for the structural-unit contract. NOT
    * `trim(x) === ""`: Spark's (and DuckDB's) default trim strips
    * only the space character, so a lone "\t" line — or, for
    * paragraph units, a newline-bearing whitespace unit — would be
    * hashed and deduped as content, silently altering whitespace
    * structure across docs (r5 review). The class is EXPLICIT, not
    * `\s`: Java's \s includes vertical tab 0x0B while RE2's does
    * not, so a bare `\s` would diverge between engine and oracle on
    * 0x0B-only units; the same literal class appears verbatim in the
    * oracle SQL.
    */
  private[graft] val BlankClass = "^[ \\t\\n\\x0B\\f\\r]*$"
  private[graft] def isBlank(c: Column): Column = c.rlike(BlankClass)

  /** (id, idx, h): one row per NON-BLANK unit occurrence. */
  private def occurrences(docs: DataFrame, idCol: String, textCol: String,
      sep: String) =
    docs.select(col(idCol).as("id"),
        posexplode(splitUnits(textCol, sep)).as(Seq("idx", "unit")))
      .filter(!isBlank(col("unit")))
      .select(col("id"), col("idx"), md5(col("unit").cast("binary")).as("h"))

  /** Reassemble docs keeping unit i ⟺ it is blank OR `keep(i)`;
    * null text passes through as null clean_text. Compiled (r6): the
    * filter/array_contains/rlike HOF chain evaluated an interpreted
    * lambda (with a regex and an O(|list|) scan) per unit; the kernel
    * does one pass with a precompiled blank pattern and a hash set —
    * identical strings (pinned by the expression-form compare in
    * MiscSpec and the q_paragraph_dedup / q_boilerplate oracles).
    */
  private def reassemble(docs: DataFrame, idxLists: DataFrame, listCol: String,
      keepWhenListed: Boolean, idCol: String, textCol: String,
      sep: String): DataFrame =
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(idxLists, Seq("id"), "left")
      .select(col("id"),
        reassembleKernel(sep, keepWhenListed)(col("text"), col(listCol))
          .as("clean_text"))

  private[graft] def reassembleKernel(sep: String, keepWhenListed: Boolean) = {
    val blank = java.util.regex.Pattern.compile(BlankClass)
    val sp = java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(sep))
    udf((text: String, ix: Seq[Int]) =>
      if (text == null) null
      else {
        val listed: Set[Int] = if (ix == null) Set.empty else ix.toSet
        val units = sp.split(text, -1)
        val sb = new java.lang.StringBuilder
        var first = true
        var i = 0
        while (i < units.length) {
          val u = units(i)
          if (blank.matcher(u).find() ||
              (if (keepWhenListed) listed(i) else !listed(i))) {
            if (!first) sb.append(sep)
            sb.append(u)
            first = false
          }
          i += 1
        }
        sb.toString
      })
  }

  /** The ORIGINAL expression-chain reassembly, retained for the
    * kernel-pinning compare in the test suite.
    */
  private[graft] def reassembleExpr(docs: DataFrame, idxLists: DataFrame,
      listCol: String, keepWhenListed: Boolean, idCol: String, textCol: String,
      sep: String): DataFrame =
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(idxLists, Seq("id"), "left")
      .withColumn("lns", splitUnits("text", sep))
      .withColumn("ix", coalesce(col(listCol), array().cast("array<int>")))
      .withColumn("clean_text",
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(array_join(filter(col("lns"), (x, i) =>
            isBlank(x) ||
              (if (keepWhenListed) array_contains(col("ix"), i)
               else !array_contains(col("ix"), i))), sep)))
      .select(col("id"), col("clean_text"))

  /** (id, clean_text): every non-blank unit kept exactly once
    * corpus-wide, at its globally first (id, idx) occurrence.
    *
    * Reassembly filters by the REMOVED index list, not the kept one:
    * the per-unit membership scan costs O(|list|) each, and for a
    * mostly-unique doc the removed list is tiny where the kept list
    * is every unit — the kept-list form was O(units²) per doc on
    * exactly the clean docs that dominate a corpus. Costs one extra
    * join of the (hash-sized) occurrence stream against the winners.
    */
  def dedupUnits(docs: DataFrame, sep: String, idCol: String = "url",
      textCol: String = "text"): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    val occ = occurrences(docs, idCol, textCol, sep)
    val winners = occ.groupBy(col("h"))
      .agg(min(struct(col("id"), col("idx"))).as("k"))
    val removed = occ.join(winners, "h")
      .filter(col("id") =!= col("k.id") || col("idx") =!= col("k.idx"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("idx"))).as("rm_idx"))
    reassemble(docs, removed, "rm_idx", keepWhenListed = false, idCol, textCol,
      sep)
  }

  /** (id, clean_text) with every copy of a ≥-minDocs-docs unit
    * removed. The doc-frequency count is exact, but the wide (h, id)
    * distinct shuffle runs only over units that SURVIVE a
    * total-occurrence pre-filter (r4 VERDICT #8): occurrences ≥
    * distinct docs, so count(*) < minDocs PROVES df < minDocs — one
    * map-side-combinable aggregate sheds the unique-unit mass (the
    * dominant fraction of a web corpus) with zero sketch error, which
    * is why this beats the approx_count_distinct variant the r4
    * verdict suggested: same shed, no HLL margin to reason about.
    * The candidate set is boilerplate-sized → broadcast join.
    */
  def dropCommonUnits(docs: DataFrame, sep: String, minDocs: Int = 10,
      idCol: String = "url", textCol: String = "text"): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    val occ = occurrences(docs, idCol, textCol, sep)
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
    reassemble(docs, removed, "rm_idx", keepWhenListed = false, idCol, textCol,
      sep)
  }

  /** Line grain ("\n"): the CCNet shard-dedup policy. */
  def dedupLines(docs: DataFrame, idCol: String = "url",
      textCol: String = "text"): DataFrame =
    dedupUnits(docs, "\n", idCol, textCol)

  /** Line grain ("\n"): the boilerplate rule. */
  def dropCommonLines(docs: DataFrame, minDocs: Int = 10, idCol: String = "url",
      textCol: String = "text"): DataFrame =
    dropCommonUnits(docs, "\n", minDocs, idCol, textCol)

  /** Paragraph grain ("\n\n" blank-line blocks): Dolma's paragraph
    * dedup policy, exact.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String = "url",
      textCol: String = "text"): DataFrame =
    dedupUnits(docs, "\n\n", idCol, textCol)

  /** Paragraph grain ("\n\n"): every copy of a ≥-minDocs-docs
    * paragraph removed (template/boilerplate blocks).
    */
  def dropCommonParagraphs(docs: DataFrame, minDocs: Int = 10,
      idCol: String = "url", textCol: String = "text"): DataFrame =
    dropCommonUnits(docs, "\n\n", minDocs, idCol, textCol)
}
