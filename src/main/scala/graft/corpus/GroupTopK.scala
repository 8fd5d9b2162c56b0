package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k selection with PER-GROUP k and NO unbounded
  * per-group sort — the selection kernel behind fractional cuts
  * ([[graft.sim.Prototypes]]' prune fraction) where k grows with the
  * group and [[DomainQuota]]'s constant-k two-phase argument stops
  * holding (its phase-2 frame is k·buckets rows — fine for k=100s,
  * one mega-task when k is 20% of a mega-cluster).
  *
  * Mechanism — histogram-staged selection, the [[graft.report.Quantiles]]
  * trick applied per group and pushed through ties:
  *
  *   1. score histogram: `(group, score) → count` (map-side
  *     combinable; the group collapses to its ≤ |distinct scores|
  *     classes before any wide exchange). A running count over THAT
  *     frame (per-group window over the bounded class frame) splits
  *     classes into picked / unpicked / THE one boundary class per
  *     group, with `need` = k − rows strictly above.
  *   2. tie split: boundary-class rows histogram again on a 4-hex-char
  *     prefix (65 536 buckets) of the deterministic md5 order key —
  *     per-group window over a ≤ 65 536-row frame finds the boundary
  *     BUCKET and its residual need.
  *   3. exact rank: row_number only within (group, boundary bucket) —
  *     expected boundary-class-size / 65 536 rows, the only true sort
  *     and three histogram levels deep.
  *
  * Order: (`scoreCol` DESC nulls last, md5(salt:id), id) — the
  * [[BudgetSelect]]/[[DomainQuota]] tie-shuffle discipline, so
  * equal-scored rows are picked fairly rather than by id locality,
  * and the whole selection is a pure deterministic function of
  * (data, salt) — oracle-replayable on any engine.
  */
object GroupTopK {

  /** Mark the top-`kCol` rows per `groupCol` by (`scoreCol` DESC,
    * md5 order, id): returns the input columns + `picked` boolean.
    * `kCol` must be constant within a group (join it from a per-group
    * frame); `idCol` must be unique. Null scores rank last.
    */
  def pick(df: DataFrame, groupCol: String, scoreCol: String, kCol: String,
      idCol: String, salt: String = ""): DataFrame = {
    val outCols = df.columns.map(col).toSeq :+ col("_picked").as("picked")
    val ord = md5(concat(lit(if (salt.isEmpty) "" else salt + ":"),
      col(idCol).cast("string")).cast("binary"))
    val base = df
      .withColumn("_ord", ord)
      .withColumn("_bkt", conv(substring(col("_ord"), 1, 4), 16, 10).cast("long"))
    // level 0: score-class histogram + running count per group
    val h0 = base.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("_cnt"), max(col(kCol)).as("_k"))
    val w0 = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cls = h0
      .withColumn("_cum", sum(col("_cnt")).over(w0))
      .withColumn("_above", col("_cum") - col("_cnt"))
      .withColumn("_verdict",
        when(col("_cum") <= col("_k"), lit(1)) // whole class picked
          .when(col("_above") >= col("_k"), lit(0)) // whole class unpicked
          .otherwise(lit(2))) // THE boundary class (unique per group)
      .withColumn("_need", col("_k") - col("_above"))
      .select(col(groupCol).as("_g0"), col(scoreCol).as("_s0"),
        col("_verdict"), col("_need"))
    // null-safe: a null group is its own group, null scores form the
    // tail class — a plain equi-join would drop both
    val joined = base.join(cls,
      col(groupCol) <=> col("_g0") && col(scoreCol) <=> col("_s0"))
      .drop("_g0", "_s0")
    val settled0 = joined.filter(col("_verdict") =!= 2)
      .withColumn("_picked", col("_verdict") === 1)
    // level 1: md5-prefix bucket histogram over boundary-class rows
    val bRows = joined.filter(col("_verdict") === 2)
    val h1 = bRows.groupBy(col(groupCol), col("_bkt"))
      .agg(count(lit(1)).as("_cnt1"), max(col("_need")).as("_need0"))
    val w1 = Window.partitionBy(groupCol).orderBy(col("_bkt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bkt = h1
      .withColumn("_cum1", sum(col("_cnt1")).over(w1))
      .withColumn("_above1", col("_cum1") - col("_cnt1"))
      .withColumn("_verdict1",
        when(col("_cum1") <= col("_need0"), lit(1))
          .when(col("_above1") >= col("_need0"), lit(0))
          .otherwise(lit(2)))
      .withColumn("_need1", col("_need0") - col("_above1"))
      .select(col(groupCol).as("_g1"), col("_bkt").as("_b1"),
        col("_verdict1"), col("_need1"))
    val joined1 = bRows.join(bkt,
      col(groupCol) <=> col("_g1") && col("_bkt") === col("_b1"))
      .drop("_g1", "_b1")
    val settled1 = joined1.filter(col("_verdict1") =!= 2)
      .withColumn("_picked", col("_verdict1") === 1)
      .drop("_verdict1", "_need1")
    // level 2: exact rank only inside (group, boundary bucket)
    val w2 = Window.partitionBy(col(groupCol), col("_bkt"))
      .orderBy(col("_ord").asc, col(idCol).asc)
    val settled2 = joined1.filter(col("_verdict1") === 2)
      .withColumn("_picked", row_number().over(w2) <= col("_need1"))
      .drop("_verdict1", "_need1")
    settled0.select(outCols: _*)
      .unionByName(settled1.select(outCols: _*))
      .unionByName(settled2.select(outCols: _*))
  }
}
