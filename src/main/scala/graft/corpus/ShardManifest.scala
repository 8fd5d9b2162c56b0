package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-sharded corpus output with a per-shard
  * manifest — the writer-side counterpart of the dedup pipeline: a
  * cleaned 10^12-doc corpus is consumed by trainers as a FIXED set of
  * shards, so the writer must (a) balance shards by a content-free
  * hash of the doc id (NOT by input order, which concentrates a
  * crawl segment's pages in one shard), (b) make the assignment
  * deterministic and re-derivable (a reader can recompute any doc's
  * shard without the manifest), and (c) emit the manifest table
  * (shard, n_docs, total_chars) the training scheduler sizes reads
  * from. Reference analog: the report sink (Report.pm) lifted from
  * one flat output to a layout contract — [EXT].
  *
  * The shard key is the first 6 hex chars of md5(id) mod `nShards` —
  * portable arithmetic (any engine with md5 re-derives it; 16^6 =
  * 16.7M spreads up to that many shards uniformly) rather than an
  * engine-private hash. Null ids shard to null and survive to the
  * manifest (one null-shard row), matching the pipeline's
  * never-silently-drop convention.
  */
object ShardManifest {

  /** The shard id of `id` under `nShards` — pure codegen'd Column. */
  def shardCol(id: Column, nShards: Int): Column = {
    require(nShards >= 1, s"nShards >= 1: $nShards")
    conv(substring(md5(id.cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("long") % nShards
  }

  /** `docs` plus a `shard` column (see [[shardCol]]). */
  def assign(docs: DataFrame, nShards: Int, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("shard", shardCol(col(idCol), nShards))

  /** (shard, n_docs, total_chars) per non-empty shard — the scheduler
    * manifest. One map-side-combining aggregate over at most
    * `nShards` + 1 keys; text itself never shuffles (lengths do).
    * Outputs without a `textCol` column (id-grain formats like
    * cluster assignments) get total_chars = 0, not an error — the
    * manifest's doc counts are the part every consumer needs.
    */
  def manifest(docs: DataFrame, nShards: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val chars =
      if (docs.columns.contains(textCol))
        coalesce(length(col(textCol)), lit(0)).cast("long")
      else lit(0L)
    assign(docs, nShards, idCol)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(chars).as("total_chars"))
  }

  /** Write `docs` under `outDir` hive-partitioned by shard
    * (`shard=K/` directories, one file per shard via the
    * shard-keyed repartition — each shard is one task's sequential
    * write), plus the manifest at `outDir/_manifest`. Returns the
    * manifest. At corpus scale, raise `nShards` until a shard fits
    * one task comfortably (the repartition is the only exchange).
    */
  def writeSharded(docs: DataFrame, outDir: String, nShards: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    assign(docs, nShards, idCol)
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val m = manifest(docs, nShards, idCol, textCol)
    m.coalesce(1).write.mode("overwrite").parquet(outDir + "/_manifest")
    m
  }
}
