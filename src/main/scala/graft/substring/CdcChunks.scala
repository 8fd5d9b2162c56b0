package graft.substring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (Gear/FastCDC-style) dedup over BINARY
  * payloads — the reference's file-level dedup domain (SURVEY §1:
  * whole-file digest cascade) pushed to sub-file grain, the way
  * storage dedup systems actually run it. Chunk boundaries are a pure
  * function of LOCAL CONTENT (a Gear rolling hash crossing a zero
  * mask — Xia et al., FastCDC, USENIX ATC'16), so inserting or
  * deleting bytes re-keys only the chunks around the edit; fixed-size
  * tiling ([[ChunkDedup]]'s token tiles, or the reference's 4096-byte
  * digest clusters, DigestFactory.pm) re-keys every later tile after
  * one insertion. That locality is the whole point: two crawls of the
  * same page differing by one injected ad still share ~all chunks.
  *
  * Scale shape (10^12 docs): chunking is MAP-ONLY (one pass per
  * payload, no state across rows). The chunk-store build shuffles
  * chunk BYTES once, but only one surviving copy per distinct hash
  * leaves the map side (min-struct keeper with map-side combine — a
  * boilerplate chunk shared by 10M docs partial-aggregates, never
  * concentrates in one task). Recipes — (id, idx, chunk_hash) — are
  * narrow ints+hash and are all that joins back at reconstruction;
  * the store join is N:1 broadcast- or shuffle-sized by DISTINCT
  * chunk count, not corpus bytes.
  */
object CdcChunks {

  /** Chunking parameters in BYTES. Defaults suit test-sized payloads;
    * at corpus scale use e.g. (2048, 13, 65536) for a ~8 KB average.
    * `maskBits` sets the average: a boundary fires when the top
    * `maskBits` bits of the rolling hash are zero (expected chunk
    * length ≈ min + 2^maskBits).
    */
  final case class Config(minSize: Int = 32, maskBits: Int = 6,
      maxSize: Int = 256) {
    require(minSize >= 1 && maxSize >= minSize && maskBits >= 1 && maskBits <= 48)
    val mask: Long = ((1L << maskBits) - 1) << (64 - maskBits)
  }

  /** The Gear table: 256 deterministic pseudo-random u64s (splitmix64
    * over the byte value — seeded, reproducible across JVMs/rounds so
    * chunk hashes are stable snapshot keys like the digest cascade's).
    */
  private[substring] val gear: Array[Long] = {
    def splitmix64(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    Array.tabulate(256)(i => splitmix64(i.toLong * 0x5851f42d4c957f2dL + 7L))
  }

  /** Boundary cut positions (exclusive chunk ends) of one payload:
    * h = (h << 1) + gear(b); cut when (h & mask) == 0 past minSize,
    * or at maxSize regardless. Always ends with bytes.length (the
    * final partial chunk). Empty input → no chunks.
    */
  private[substring] def boundaries(bytes: Array[Byte], cfg: Config): Array[Int] = {
    if (bytes == null || bytes.isEmpty) return Array.emptyIntArray
    val out = new scala.collection.mutable.ArrayBuffer[Int](bytes.length / cfg.minSize + 1)
    var h = 0L
    var start = 0
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= cfg.minSize && (h & cfg.mask) == 0L) || len >= cfg.maxSize) {
        out += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) out += bytes.length
    out.toArray
  }

  /** (id, idx, offset, len, chunk_md5, chunk) recipe+payload rows —
    * MAP-ONLY. `chunk` rides only as far as the store build; recipes
    * drop it immediately (select the narrow columns) so corpus bytes
    * never shuffle twice.
    */
  def chunkRows(docs: DataFrame, cfg: Config = Config(),
      idCol: String = "id", binCol: String = "payload"): DataFrame = {
    val chunkU = udf((b: Array[Byte]) =>
      if (b == null) null
      else {
        val cuts = boundaries(b, cfg)
        var start = 0
        cuts.zipWithIndex.map { case (end, idx) =>
          val c = java.util.Arrays.copyOfRange(b, start, end)
          start = end
          (idx, end - c.length, c.length, c)
        }.toSeq
      })
    docs
      .select(col(idCol).as("id"), explode(chunkU(col(binCol))).as("c"))
      .select(col("id"), col("c._1").as("idx"), col("c._2").as("offset"),
        col("c._3").as("len"), md5(col("c._4")).as("chunk_md5"),
        col("c._4").as("chunk"))
  }

  /** The deduplicated chunk store: ONE row per distinct chunk_md5,
    * keeper = min (id, idx) occurrence (deterministic; map-side
    * combining max/min-struct — a 10M-copy boilerplate chunk
    * partial-aggregates per task, the [[ChunkDedup]] keeper shape).
    */
  def store(chunkRows: DataFrame): DataFrame =
    chunkRows
      .groupBy(col("chunk_md5"))
      .agg(min(struct(col("id"), col("idx"), col("chunk"))).as("k"))
      .select(col("chunk_md5"), col("k.id").as("keeper_id"),
        col("k.idx").as("keeper_idx"), col("k.chunk").as("chunk"))

  /** Byte-exact reconstruction FROM THE STORE: every doc reassembled
    * by joining its narrow recipe rows to the deduped store (N:1 on
    * chunk_md5) and concatenating in idx order — (id, n_chunks,
    * reconstructed_md5). This is the storage-dedup invariant: the
    * recipe + unique-chunk store reproduces the original payload
    * bit-exactly, md5-checkable against the source table by an
    * independent oracle.
    */
  def reconstruct(chunkRows: DataFrame, storeDf: DataFrame): DataFrame = {
    val spark = chunkRows.sparkSession
    import spark.implicits._
    chunkRows.select(col("id"), col("idx"), col("chunk_md5"))
      .join(storeDf.select(col("chunk_md5"), col("chunk")), Seq("chunk_md5"))
      .select(col("id"), col("idx"), col("chunk"))
      .as[(String, Int, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (id, rows) =>
        val parts = rows.map(r => (r._2, r._3)).toArray.sortBy(_._1)
        val out = new java.io.ByteArrayOutputStream(
          parts.iterator.map(_._2.length).sum)
        parts.foreach(p => out.write(p._2))
        (id, parts.length, out.toByteArray)
      }
      .toDF("id", "n_chunks", "payload")
      .select(col("id"), col("n_chunks"), md5(col("payload")).as("reconstructed_md5"))
  }

  /** Corpus dedup economics in one row: total vs distinct chunks and
    * bytes (the number a storage-dedup operator sizes hardware by).
    */
  def stats(chunkRows: DataFrame): DataFrame = {
    val total = chunkRows.agg(
      count(lit(1)).as("total_chunks"), sum(col("len")).as("total_bytes"))
    val distinctAgg = chunkRows.groupBy(col("chunk_md5"))
      .agg(first(col("len")).as("len"))
      .agg(count(lit(1)).as("distinct_chunks"), sum(col("len")).as("distinct_bytes"))
    total.crossJoin(distinctAgg)
      .select(col("total_chunks"), col("total_bytes"),
        col("distinct_chunks"), col("distinct_bytes"),
        (col("total_bytes") - col("distinct_bytes")).as("bytes_saved"))
  }
}
