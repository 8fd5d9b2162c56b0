package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: keep the highest-quality documents
  * whose cumulative token mass fits a training budget — the "select
  * the best B tokens" step that follows scoring in a webtext pipeline
  * (the DCLM / quality-threshold shape, but with the threshold derived
  * exactly from the budget instead of hand-tuned).
  *
  * Semantics (exact, deterministic): order documents by (score DESC,
  * md5(salt:id), id) — the md5 key is the same deterministic
  * tie-shuffle as [[Packing]], so equal-scored docs are budget-cut
  * fairly rather than by id locality — and keep every document whose
  * INCLUSIVE running token sum is <= budget (greedy prefix; a later
  * smaller doc never back-fills, so the kept set is a contiguous
  * prefix of the quality order and downstream mixes stay
  * reproducible).
  *
  * Scale shape — the corpus is never globally sorted:
  *
  *   1. per-SCORE token totals: one map-side-combinable aggregate
  *      collapsing the corpus to its |distinct scores| rows (scores
  *      are integers by this engine's exact-arithmetic discipline —
  *      micro-unit quality scores, token-count buckets, ranks);
  *   2. a running sum over THAT small frame (the [[graft.report.Quantiles]]
  *      shape) classifies each score class as kept-whole (class end
  *      <= budget), dropped-whole (class start > budget), or THE one
  *      boundary class the budget cuts through;
  *   3. kept-whole / dropped-whole docs are flagged with a broadcast
  *      join + filter — no per-doc ordering at all;
  *   4. only the boundary class's docs get a per-doc running sum, via
  *      the [[Packing]] two-phase distributed prefix sum (hex-prefix
  *      range buckets of the md5 order key, per-bucket offsets from a
  *      <=16^hexChars-row window, within-bucket windows that all sort
  *      in parallel) — exact even when the whole corpus shares one
  *      score.
  *
  * The easy/boundary branches each re-read the input (two scans of
  * (id, score, tokens) — deliberately, so NEITHER branch pays a
  * corpus-wide window; the tiny class-totals exchange is identical in
  * all branches and AQE's query-stage reuse computes it once).
  *
  * Reference scope: the reference engine (Engine.pm) selects by
  * identity only; budget selection is the [EXT] LLM-pipeline scope
  * this engine adds (SURVEY.md §2 extensions).
  */
object BudgetSelect {

  /** Per-doc keep verdict: (id, score, n_tokens, kept).
    *
    * @param docs      input frame
    * @param scoreCol  integer quality score evaluated over `docs`
    *                  (null ranks below every non-null score)
    * @param tokensCol token count evaluated over `docs` (null -> 0)
    * @param budget    token budget (>= 0)
    * @param idCol     unique doc id column name
    * @param salt      tie-shuffle epoch key (the [[Packing]] contract)
    * @param hexChars  order-key prefix length for the boundary-class
    *                  prefix-sum buckets (16^hexChars buckets)
    */
  def select(docs: DataFrame, scoreCol: Column, tokensCol: Column,
      budget: Long, idCol: String = "id", salt: String = "",
      hexChars: Int = 2): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0: $budget")
    require(hexChars >= 1 && hexChars <= 8, s"hexChars in [1,8]: $hexChars")
    val base = docs.select(
      col(idCol).as("id"),
      scoreCol.cast("long").as("score"),
      coalesce(tokensCol.cast("long"), lit(0L)).as("n_tokens"),
      md5(concat(lit(if (salt.isEmpty) "" else salt + ":"),
        col(idCol).cast("string")).cast("binary")).as("ord"))

    // phase 1+2: score-class totals and start offsets. null scores
    // rank last (desc_nulls_last matches ORDER BY score DESC in
    // ANSI engines), so a null-scored class is cut after every real
    // score; the window runs over the |distinct scores| frame only.
    val classes = base.groupBy(col("score").as("cls_score"))
      .agg(sum(col("n_tokens")).as("class_tokens"))
      .select(col("cls_score"), col("class_tokens"),
        coalesce(sum(col("class_tokens")).over(
          Window.orderBy(col("cls_score").desc_nulls_last)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("class_offset"))

    // lazy checkpoint (r6): the easy filter, the boundary filter, the
    // bucket-offset aggregate and the flagged prefix sum each re-ran
    // this subtree (scan + md5 ord + broadcast class join) otherwise;
    // cached on first use
    val withCls = base.join(broadcast(classes), col("score") <=> col("cls_score"))
      .select(col("id"), col("score"), col("n_tokens"), col("ord"),
        col("class_tokens"), col("class_offset"))
      .localCheckpoint(false)

    // whole classes: kept iff the class END fits; exactly one class
    // can satisfy offset <= budget < offset + tokens (the boundary)
    val wholeKept = col("class_offset") + col("class_tokens") <= lit(budget)
    val wholeDropped = col("class_offset") > lit(budget)
    val easy = withCls.filter(wholeKept || wholeDropped)
      .select(col("id"), col("score"), col("n_tokens"), wholeKept.as("kept"))

    // boundary class: two-phase prefix sum in (ord, id) order. The
    // bucket is a PREFIX of ord, so bucket order is consistent with
    // the within-class global order by construction (Packing).
    val bdry = withCls.filter(!wholeKept && !wholeDropped)
      .withColumn("bucket",
        conv(substring(col("ord"), 1, hexChars), 16, 10).cast("long"))
    val bucketOff = bdry.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .select(col("bucket"),
        coalesce(sum(col("bucket_tokens")).over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("bucket_offset"))
    val w = Window.partitionBy("bucket").orderBy("ord", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bdryFlagged = bdry
      .join(broadcast(bucketOff), Seq("bucket"))
      .select(col("id"), col("score"), col("n_tokens"),
        (col("class_offset") + col("bucket_offset") + sum(col("n_tokens")).over(w)
          <= lit(budget)).as("kept"))

    easy.unionByName(bdryFlagged)
  }
}
