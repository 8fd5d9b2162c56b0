package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay the whole corpus out as one
  * deterministic pseudo-random token stream and cut it every `budget`
  * tokens — the GPT-style "concatenate and chunk" batch layout. Each
  * document gets the training sequence its first token lands in
  * (`seq_id`) and its offset inside that sequence (`seq_offset`), so a
  * downstream tokenizer pass can materialize fixed-length rows without
  * any global coordination. The order key md5(salt:id) IS the epoch
  * shuffle — a new salt is a new epoch order, reproducible per row
  * (re-runs, resumes, and late shards agree; the [[Mixture]] /
  * [[Splits]] determinism contract).
  *
  * The global running sum is computed WITHOUT a global sort — the
  * classic two-phase distributed prefix sum:
  *
  *   1. bucket = first hex byte of the order key (256 uniform
  *      buckets, and a PREFIX of the order key, so bucket order is
  *      consistent with global key order by construction);
  *   2. per-bucket token totals — one map-side-combinable aggregate
  *      over ≤256 groups — turned into per-bucket START OFFSETS by a
  *      window over that 256-row frame (single-partition window over
  *      a config-constant-sized frame, never the corpus);
  *   3. within-bucket running sums — a window PARTITIONED by bucket
  *      (corpus/256 rows each, all buckets sort in parallel) — plus
  *      the broadcast-joined bucket offset.
  *
  * At 10^12 docs the plan is one scan + one 256-row agg + one
  * bucket-partitioned sort; widen `buckets` (any power of 16 of hex
  * prefix — 2 hex chars = 256, 3 = 4096) to keep per-bucket sort
  * partitions executor-sized. Every primitive (md5 hex prefix,
  * integer div/mod, window frame) has identical semantics in DuckDB,
  * whose oracle recomputes the SAME layout with one global window —
  * the equality IS the proof the two-phase decomposition is exact.
  */
object Packing {

  /** (id, n_tokens, seq_id, seq_offset) for every document.
    *
    * @param nTokens token-count Column evaluated over `docs` (null →
    *                0; zero-width docs still get the position their
    *                start falls at)
    * @param budget  tokens per training sequence (e.g. 2048·1024 for
    *                a 2k-context batch of 1024 rows)
    * @param salt    epoch key — changing it reshuffles the order
    * @param hexChars order-key prefix length in hex chars (buckets =
    *                16^hexChars); 2 ⇒ 256 buckets
    */
  def pack(docs: DataFrame, nTokens: Column, budget: Long,
      idCol: String = "id", salt: String = "epoch0",
      hexChars: Int = 2): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(hexChars >= 1 && hexChars <= 8, s"hexChars in [1,8]: $hexChars")
    val base = docs.select(
      col(idCol).as("id"),
      coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"),
      md5(concat(lit(salt + ":"), col(idCol).cast("string")).cast("binary")).as("ord"))
      .withColumn("bucket", conv(substring(col("ord"), 1, hexChars), 16, 10).cast("long"))

    // phase 2: per-bucket start offsets — a ≤16^hexChars-row frame
    val offsets = base.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .select(col("bucket"),
        coalesce(sum(col("bucket_tokens")).over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("bucket_offset"))

    // phase 3: within-bucket running sum + the broadcast offset
    val w = Window.partitionBy("bucket").orderBy("ord", "id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(offsets), Seq("bucket"))
      .select(col("id"), col("n_tokens"),
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) + col("bucket_offset"))
          .as("cum_before"))
      .select(col("id"), col("n_tokens"),
        // integer DIV, not `/` (which is double division and would
        // round at 2^53 — a 10^12-doc corpus's token cumsum is close)
        expr(s"CAST(cum_before DIV ${budget}L AS BIGINT)").as("seq_id"),
        pmod(col("cum_before"), lit(budget)).cast("long").as("seq_offset"))
  }
}
