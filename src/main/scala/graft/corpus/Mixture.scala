package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture resampling — the corpus-mixing step of an
  * LLM data pipeline (GPT-3 Table 2.2 / Gopher-style source weights:
  * up-sample high-quality sources, down-sample the crawl): each source
  * carries a weight w ≥ 0 and every document is emitted
  * floor(w) + Bernoulli(frac(w)) times, so E[copies] = w exactly per
  * document. The "coin" is the md5-prefix u32 of (salt, id) — the
  * [[Splits]] bucket — so the decision is a pure function of the row:
  * re-runs, resumed jobs, and late shards agree; no RNG state, no
  * sampling skew between partitions.
  *
  * Map-side only: weight lookup is a literal map, the copy fan-out is
  * a per-row `explode(sequence(...))` — zero shuffles at any corpus
  * size, and down-sampling (w < 1) PRUNES rows before the explode so
  * a 0.1-weighted crawl slice never materializes its dropped rows.
  */
object Mixture {

  /** `docs` with a `copy_ix` column (0 .. copies−1): rows repeated per
    * their source's weight; copies = 0 rows vanish. Sources absent
    * from `weights` default to weight 1.0 (pass-through).
    */
  def resample(docs: DataFrame, weights: Map[String, Double],
      sourceCol: String = "source", idCol: String = "doc_id",
      salt: String = "mix", as: String = "copy_ix"): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w.isFinite),
      s"weights must be finite and >= 0: $weights")
    val w: Column = coalesce(
      element_at(typedLit(weights), col(sourceCol)), lit(1.0))
    // integer-exact Bernoulli(frac(w)): the u32 bucket is compared to
    // floor(frac(w)·2^32) — multiplication by 2^32 is exact in double,
    // so both engines (and every re-run) compute the same threshold
    val thresh = floor((w - floor(w)) * lit(4294967296.0))
    val extra = when(Splits.bucket(col(idCol).cast("string"), salt) < thresh, 1L)
      .otherwise(0L)
    val copies = (floor(w).cast("long") + extra).as("copies")
    docs
      .withColumn("copies", copies)
      .filter(col("copies") > 0)
      .withColumn(as, explode(sequence(lit(0L), col("copies") - 1)))
      .drop("copies")
  }

  /** Effective epoch count per source after resampling — the mixing
    * report (one tiny aggregate): (source, n_docs, n_emitted,
    * effective_weight).
    */
  def report(docs: DataFrame, weights: Map[String, Double],
      sourceCol: String = "source", idCol: String = "doc_id",
      salt: String = "mix"): DataFrame = {
    val emitted = resample(docs, weights, sourceCol, idCol, salt)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_emitted"))
    docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .join(emitted, Seq(sourceCol), "left")
      .select(col(sourceCol),
        col("n_docs"),
        coalesce(col("n_emitted"), lit(0L)).as("n_emitted"),
        round(coalesce(col("n_emitted"), lit(0L)) / col("n_docs"), 6)
          .as("effective_weight"))
  }
}
