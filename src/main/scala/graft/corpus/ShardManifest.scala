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
    graft.functions.Hashing.hexPrefixLong(
      id.cast("string").cast("binary"), 6) % nShards
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

  /** Murmur3(seed 42) preimages for partitions 0..n-1: `pre(s)` is an
    * int whose Spark hash-partition under `n` partitions is exactly
    * `s`. Lets a plain hash `repartition` place shard s in task s —
    * a naive `repartition(n, col("shard"))` balls-in-bins ~37% of
    * tasks empty and piles ~3 shards on the max task; and
    * `repartitionByRange` would fix the layout but at the cost of a
    * SECOND full execution of the upstream DAG for range-boundary
    * sampling. Expected n·H(n) driver-side probes — microseconds for
    * any real shard count.
    */
  private def partitionPreimages(n: Int): Array[Int] = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt
    val out = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var j = 0
    while (remaining > 0) {
      val p = ((hashInt(j, 42) % n) + n) % n
      if (!found(p)) { found(p) = true; out(p) = j; remaining -= 1 }
      j += 1
    }
    out
  }

  /** Write `docs` under `outDir` hive-partitioned by shard
    * (`shard=K/` directories, ONE file per shard: the preimage-keyed
    * repartition places each shard in its own task — see
    * [[partitionPreimages]]), plus the manifest at
    * `outDir/_manifest`. Returns the manifest.
    *
    * The upstream DAG executes exactly ONCE (the shard write); the
    * manifest is then aggregated from the WRITTEN parquet — a
    * column-pruned re-read of `textCol` + the partition dirs, so it
    * is (a) cheap at corpus scale and (b) guaranteed to describe the
    * shards actually on disk even if the input is live. At corpus
    * scale, raise `nShards` until a shard fits one task comfortably
    * (the repartition is the only exchange). Null-id docs (shard
    * null) ride whichever task their null routing hash picks —
    * they are a single degenerate group, not a layout concern.
    */
  def writeSharded(docs: DataFrame, outDir: String, nShards: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pre = partitionPreimages(nShards)
    assign(docs, nShards, idCol)
      .repartition(nShards, element_at(lit(pre), (col("shard") + 1).cast("int")))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val written = docs.sparkSession.read.parquet(outDir)
      .withColumn("shard", col("shard").cast("long"))
    val chars =
      if (written.columns.contains(textCol))
        coalesce(length(col(textCol)), lit(0)).cast("long")
      else lit(0L)
    val m = written.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(chars).as("total_chars"))
    m.coalesce(1).write.mode("overwrite").parquet(outDir + "/_manifest")
    m
  }
}
