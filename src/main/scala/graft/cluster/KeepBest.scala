package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-based canonical selection: one representative per duplicate
  * group, chosen by HIGHEST score (ties → lowest id) instead of the
  * min-id policy the identity stage uses (reference semantics,
  * Files.t:233-258 resolve-aliases). Webtext pipelines keep the
  * best-quality member of each near-dup cluster (the
  * CCNet/RefinedWeb-style policy) — min-id is deterministic but
  * arbitrary; this operator is the policy a 10^12-doc training-data
  * pipeline actually wants.
  *
  * Scale shape: arg-max as ONE map-side-combinable
  * `min(struct(-score, id))` aggregation — no window function (a
  * window sorts every group's rows and cannot partial-aggregate; the
  * min-struct partial combines on the map side, so a 10M-row
  * boilerplate cluster ships one struct per task, not 10M sorted
  * rows). Works for ANY orderable id type (int doc ids, url strings):
  * Spark's double ordering treats -0.0 = 0.0 (SQLOrderingUtil), so
  * negation cannot perturb ties, and the emitted best_score is
  * re-negated with a `+ 0.0` normalization so a zero score never
  * leaks as -0.0. Scores must not be NaN or null (NaN orders above
  * all doubles, null sorts first under min — either would win every
  * group; coalesce upstream).
  */
object KeepBest {

  /** One row per group: (groupCols..., keep_id, best_score) where
    * keep_id maximizes `score` (ties → minimum `idCol`).
    */
  def representatives(df: DataFrame, groupCols: Seq[String], score: Column,
      idCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(min(struct((-score).as("nq"), col(idCol).as("id"))).as("k"))
      .select(groupCols.map(col) :+
        col("k.id").as("keep_id") :+ (-col("k.nq") + lit(0.0)).as("best_score"): _*)

  /** Membership view: every row of `df` tagged with its group's
    * keep_id and whether THIS row is the kept representative —
    * the filterable form (`kept = true` IS the deduped corpus). The
    * join back is NULL-SAFE on the group keys: groupBy treats null as
    * a group, so an equi-join would silently drop every null-keyed
    * row from the membership view.
    */
  def markKept(df: DataFrame, groupCols: Seq[String], score: Column,
      idCol: String): DataFrame = {
    val reps = representatives(df, groupCols, score, idCol)
      .select(groupCols.map(c => col(c).as(s"__r_$c")) :+
        col("keep_id") :+ col("best_score"): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    df.join(reps, cond)
      .drop(groupCols.map(c => s"__r_$c"): _*)
      .withColumn("kept", col(idCol) === col("keep_id"))
  }
}
