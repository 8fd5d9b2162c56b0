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
  * Scale shape: arg-max as ONE map-side-combinable `max(struct(score,
  * -id))` aggregation — no window function (a window sorts every
  * group's rows and cannot partial-aggregate; the max-struct partial
  * combines on the map side, so a 10M-row boilerplate cluster ships
  * one struct per task, not 10M sorted rows). Integer id negation
  * gives the ascending tie-break inside a descending max — exact,
  * no float sign-zero hazards.
  */
object KeepBest {

  /** One row per group: (groupCols..., keep_id, best_score) where
    * keep_id maximizes `score` (ties → minimum `idCol`). `idCol` must
    * be a signed integral column (the tie-break negates it).
    */
  def representatives(df: DataFrame, groupCols: Seq[String], score: Column,
      idCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(max(struct(score.as("q"), (-col(idCol)).as("nid"))).as("k"))
      .select(groupCols.map(col) :+
        (-col("k.nid")).as("keep_id") :+ col("k.q").as("best_score"): _*)

  /** Membership view: every row of `df` tagged with its group's
    * keep_id and whether THIS row is the kept representative —
    * the filterable form (`kept = true` IS the deduped corpus).
    */
  def markKept(df: DataFrame, groupCols: Seq[String], score: Column,
      idCol: String): DataFrame =
    df.join(representatives(df, groupCols, score, idCol), groupCols)
      .withColumn("kept", col(idCol) === col("keep_id"))
}
