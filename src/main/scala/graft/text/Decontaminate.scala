package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training docs that overlap an
  * evaluation set (the hygiene pass every LLM data pipeline runs:
  * GPT-3 appendix C / The Pile use 13-gram collision against eval
  * sets; public methodology, implemented fresh).
  *
  * A doc is contaminated when ≥ `minShared` of its w-token windows
  * (stride 1 — any alignment) also occur in ANY benchmark doc.
  *
  * Scale shape: the benchmark side is an eval set — thousands of
  * docs, not billions — so its DISTINCT window-hash set is explicitly
  * `broadcast()`; the corpus side stays map-side (hash windows →
  * broadcast-hash semi-probe → per-doc count), no corpus shuffle at
  * all except the per-doc count aggregation of the (rare) hits.
  * Window hashing reuses the substring stack's content hashes.
  */
object Decontaminate {

  /** (id, n_hits, contaminated) for every doc with tokenizable text:
    * n_hits = how many of the doc's windows occur in the benchmark
    * window set (per position — a window repeated in the doc counts
    * each occurrence).
    */
  def flag(docs: DataFrame, bench: DataFrame, w: Int = 13,
      minShared: Int = 1, idCol: String = "url", textCol: String = "text",
      benchIdCol: String = "url", benchTextCol: String = "text"): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
    val dw = graft.substring.SubstringDedup.windowHashes(
      base, w, stride = 1, idCol, textCol)
    val bw = broadcast(graft.substring.SubstringDedup.windowHashes(
        bench.filter(col(benchTextCol).isNotNull), w, stride = 1,
        benchIdCol, benchTextCol)
      .select(col("win_hash")).distinct())
    val hits = dw.join(bw, "win_hash")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
    base.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minShared)
  }
}
