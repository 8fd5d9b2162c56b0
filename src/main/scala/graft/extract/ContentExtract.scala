package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Main-content extraction: classify a page's block-level segments by
  * length and link density and keep only the content blocks — the
  * jusText / boilerplate-removal family of extractors (Pomikalek 2011;
  * trafilatura's core rule), which removes navigation, link farms,
  * footers and sidebars that a whole-page tag strip (TextExtract)
  * keeps. Where [[graft.substring.LineDedup]] drops boilerplate that
  * REPEATS across a site, this drops boilerplate recognizable from a
  * single page alone — the two compose.
  *
  * Block model: the page splits at block-level tag boundaries (p, div,
  * headings, list/table elements, br, hr, semantic html5 containers);
  * inline markup (a, b, span, ...) stays inside its block. Per block:
  *
  *   - `clean`: tags stripped, the 5 core entities decoded, whitespace
  *     collapsed (the TextExtract normal form, per-block);
  *   - `link_chars`: the summed length of the SAME normal form of each
  *     `<a ...>...</a>` inner text — so density is measured in exactly
  *     the units `clean` is;
  *   - good iff length(clean) >= minChars AND link_chars * linkDen <=
  *     length(clean) (integer cross-multiplication, no float ratio).
  *
  * `main_text` joins the good blocks with a newline, preserving block
  * order. Everything is codegen'd Column HOFs over one html read — no
  * UDF, no shuffle; at 100 TB this is a pure map stage that fuses into
  * the scan, and the html bytes never leave the task.
  *
  * Reference scope: the reference engine has no extraction stage at
  * all (it reads opaque files); this is [EXT] webtext scope alongside
  * TextExtract, with the same byte-determinism contract.
  */
object ContentExtract {

  /** Block-boundary tags. `br`/`hr` split too: consecutive anchors
    * separated only by line breaks are one link farm, not content.
    */
  val BlockTagPattern: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|" +
      "blockquote|pre|article|section|header|footer|nav|aside|main|figure|" +
      "figcaption|form|fieldset|br|hr)\\b[^>]*>"

  /** Anchor inner text (group 1), dotall + case-insensitive. */
  val AnchorPattern: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** The [[TextExtract]] normal form, per block — ONE shared
    * definition, so page-level and block-level units can never
    * diverge.
    */
  private def stripNormalize(c: Column): Column =
    TextExtract.stripTagsNormalize(c)

  /** Pre-clean (the TextExtract gate without the tag strip): null on
    * invalid UTF-8, drop doctype/comments/head/script/style/noscript
    * wholesale. `<head>` goes as a block — a page TITLE is metadata,
    * not content, and without this it would strip to plain text long
    * enough to pass the block verdict on every page (jusText operates
    * on the body for the same reason).
    */
  private def preClean(html: Column): Column = {
    val cleaned = Seq("head", "script", "style", "noscript")
      .foldLeft(TextExtract.stripDocComments(html.cast("string")))(
        TextExtract.stripBlock)
    TextExtract.utf8Gate(html, cleaned)
  }

  /** (idCols..., main_text, n_blocks, n_good) — `n_blocks` counts
    * non-blank blocks, `main_text` is null iff the html was
    * null/undecodable (quarantine convention), empty when no block
    * passes.
    *
    * Three select steps materialize the fragment and block arrays as
    * real columns before each lambda consumes them (SCALE.md invariant
    * 7: an inlined tree re-evaluates per element).
    */
  def mainContent(df: DataFrame, html: Column, minChars: Int = 25,
      linkDen: Int = 3, idCols: Seq[String] = Seq("doc_id")): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1: $minChars")
    require(linkDen >= 1, s"linkDen must be >= 1: $linkDen")
    val ids = idCols.map(col)
    val frags = df.select(ids :+ split(preClean(html), BlockTagPattern).as("frags"): _*)
    val blocks = frags.select(ids :+
      filter(
        transform(col("frags"), f =>
          struct(
            stripNormalize(f).as("clean"),
            coalesce(
              aggregate(
                transform(regexp_extract_all(f, lit(AnchorPattern), lit(1)),
                  a => length(stripNormalize(a)).cast("long")),
                lit(0L), (acc, x) => acc + x),
              lit(0L)).as("link_chars"))),
        b => length(b("clean")) > 0).as("blocks"): _*)
    // `good` is staged as its own projected column (SCALE.md invariant
    // 7 — the same discipline as frags/blocks above): as a bare
    // expression it was consumed by BOTH main_text and n_good, so the
    // length/link-density filter ran over the block array twice per
    // page on the corpus-scale hot path (r5 review). The second
    // static reference (size >= 0) pins it against CollapseProject.
    val goods = blocks.select(ids :+ col("blocks") :+
      filter(col("blocks"), b =>
        length(b("clean")) >= minChars &&
          b("link_chars") * linkDen <= length(b("clean"))).as("good"): _*)
    goods.select(ids ++ Seq(
      when(col("blocks").isNull, lit(null: String))
        .otherwise(when(size(col("good")) >= 0,
          array_join(transform(col("good"), b => b("clean")), "\n")))
        .as("main_text"),
      coalesce(size(col("blocks")).cast("long"), lit(0L)).as("n_blocks"),
      coalesce(size(col("good")).cast("long"), lit(0L)).as("n_good")): _*)
  }
}
