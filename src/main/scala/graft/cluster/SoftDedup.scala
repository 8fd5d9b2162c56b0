package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Soft deduplication — duplicate-aware loss re-weighting (He et al.
  * 2024, "SoftDedup"; the sampling-weight alternative to hard
  * removal): instead of DROPPING a duplicate cluster's members, every
  * document carries weight = 1 / |cluster|, so each content unit
  * contributes equal total gradient mass to training. Hard dedup's
  * keep-one policy ([[KeepBest]] / the min-id canonicals) destroys
  * within-cluster variation (boilerplate-adjacent near-dups often
  * differ in the part that matters); the soft policy keeps every
  * member, removes the over-representation bias, and lets the trainer
  * sample by weight. Reference analog: the reference only reports
  * groups (Report.pm); weighting is [EXT] training-data ops.
  *
  * Determinism: weight_micro = 1000000 div n_members — exact integer
  * division, oracle-replayable; per-cluster total mass is
  * n·(1000000 div n) ∈ (1000000 − n, 1000000] (floor truncation, the
  * documented bias — a trainer normalizes by the realized sum).
  *
  * Scale shape: one map-side-combinable count keyed on the component
  * label, then a join back on the SAME key — the assignment frame is
  * already partitioned by component from the count's exchange, so AQE
  * reuses it; nothing wider than (id, component) ever shuffles.
  */
object SoftDedup {

  /** (idCol, compCol, n_members, weight_micro) for every assignment
    * row — weight_micro = 1000000 div cluster size.
    */
  def weights(assign: DataFrame, idCol: String = "id",
      compCol: String = "component"): DataFrame = {
    val sizes = assign.groupBy(col(compCol))
      .agg(count(lit(1)).as("n_members"))
    assign.select(col(idCol), col(compCol))
      .join(sizes, Seq(compCol))
      .withColumn("weight_micro", expr("1000000 div n_members"))
      .select(col(idCol), col(compCol), col("n_members"), col("weight_micro"))
  }
}
