package graft.near

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash fingerprints with Hamming-ball candidate probing [EXT]
  * (north rule; SURVEY §7.1 module 7).
  *
  * 64-bit SimHash over token-frequency features; candidates found by
  * chunking the fingerprint into `chunks` pieces — by pigeonhole, two
  * fingerprints within Hamming distance (chunks − 1) share at least
  * one exact chunk, so an equi-self-join per chunk finds every pair in
  * the ball (this is the join-friendly form of Hamming-ball probing:
  * no similarity join operator needed, plain shuffled equi-joins that
  * Catalyst plans and AQE skew-handles).
  */
object SimHash {

  /** Defaults tuned on the planted corpus: the J≈0.95 tier sits at
    * Hamming 2-7 (median 4), so the ball is 7 with 8×8-bit chunks
    * (pigeonhole: ham ≤ 7 ⇒ ≥1 of 8 chunks equal). Unrelated docs sit
    * near Hamming 32 — P(≤7) ≈ 0, so the wider ball stays precise.
    */
  case class Config(chunks: Int = 8, maxHamming: Int = 7, seed: Long = 42L, maxBucket: Int = 200) {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
  }

  def simhash64(tokens: Array[String], seed: Long): Long = {
    if (tokens.isEmpty) return 0L
    val acc = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val s = tokens(i)
      var sh = 0xcbf29ce484222325L
      var p = 0
      while (p < s.length) { sh = (sh ^ s.charAt(p)) * 0x100000001b3L; p += 1 }
      val h = Hashing.mix64(sh ^ seed)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val simhashUdf = udf((text: String, seed: Long) =>
    SimHash.simhash64(Hashing.tokenize(text), seed))

  /** (id, simhash) — map-side only. Empty/null text → null fingerprint
    * (excluded from probing; empties are the exact stage's job).
    */
  def fingerprints(docs: DataFrame, cfg: Config = Config(), textCol: String = "text",
      idCol: String = "url"): DataFrame =
    docs.select(col(idCol).as("id"),
      when(col(textCol).isNull || trim(col(textCol)) === "", lit(null))
        .otherwise(simhashUdf(col(textCol), lit(cfg.seed))).as("simhash"))

  /** Near-dup edges: pairs with Hamming(simhash) ≤ maxHamming.
    * Chunk-probing self-join; verification = popcount of xor, a
    * codegen'd built-in (bit_count).
    */
  def edges(docs: DataFrame, cfg: Config = Config(), textCol: String = "text",
      idCol: String = "url"): DataFrame = {
    val fp = fingerprints(docs, cfg, textCol, idCol).filter(col("simhash").isNotNull)
    val w = 64 / cfg.chunks
    val chunked = fp.select(col("id"), col("simhash"),
      posexplode(array((0 until cfg.chunks).map(c =>
        shiftright(col("simhash"), c * w).bitwiseAND(lit((1L << w) - 1))): _*))
        .as(Seq("chunk_id", "chunk_val")))
    // ONE shuffle: group the (chunk_id, chunk_val) bucket, pair inside
    // the (cap-bounded) bucket, verify Hamming on the carried
    // fingerprints — no window sort, no self-join (same shape as
    // MinHashLSH.candidates)
    chunked
      .groupBy(col("chunk_id"), col("chunk_val"))
      .agg(collect_list(struct(col("id"), col("simhash"))).as("ms"))
      .filter(size(col("ms")).between(2, cfg.maxBucket))
      .select(explode(hamPairsUdf(col("ms"), lit(cfg.maxHamming))).as("p"))
      .select(col("p._1").as("src"), col("p._2").as("dst"), col("p._3").as("hamming"))
      .distinct()
  }

  /** Within-bucket pairs with Hamming(simhash) ≤ max — verification
    * fused into pair generation.
    */
  private val hamPairsUdf = udf { (ms: Seq[org.apache.spark.sql.Row], maxHam: Int) =>
    val s = ms.map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    for {
      i <- s.indices
      j <- (i + 1) until s.length
      h = java.lang.Long.bitCount(s(i)._2 ^ s(j)._2)
      if h <= maxHam
    } yield (s(i)._1, s(j)._1, h)
  }
}
