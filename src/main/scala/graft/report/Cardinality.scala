package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Distinct-cardinality sketch (HyperLogLog, Flajolet et al. 2007) —
  * the dedup PLANNING operator: before the exact cascade sizes its
  * shuffles, estimate distinct-text counts (global and per group)
  * in one pass where `count(DISTINCT text)` would shuffle the full
  * corpus width. Reference analog: none — [EXT], training-data ops
  * (the same audit Engine.pm's count_keys metrics answer after the
  * fact, moved ahead of the run).
  *
  * Portability/determinism contract: the row hash is the repo's
  * md5-hex-prefix long ([[Hashing.hexPrefixLong]], 15 hex chars =
  * 60 bits — any oracle engine re-derives it), register index = top
  * `p` bits, rho = leading-zero count of the remaining `60-p` bits
  * + 1 (bit length via decimal→binary string conversion — exact in
  * both engines, no float log2 at power-of-two boundaries). The
  * estimator is exact integer arithmetic end-to-end:
  *
  *   S       = sum_j 2^(rhoMax - M[j])   (longs; <= m * 2^rhoMax = 2^61)
  *   raw     = (alphaMicro * m^2 * 2^rhoMax) div (S * 10^6)
  *             (DECIMAL(38,0) integral division — numerator < 10^28)
  *   est     = if raw <= 2.5m and V > 0:  linear counting
  *             m * (lnMicro(m) - lnMicro(V)) div 10^6
  *             else raw
  *
  * where V = empty registers and lnMicro is the [[graft.text.Entropy]]
  * micro-nat discipline (round(ln * 10^6) per integer input — libm
  * ulp differences are invisible at micro granularity). alphaMicro =
  * round(0.7213 / (1 + 1.079/m) * 10^6), the Flajolet bias constant
  * pinned to micro units; the 60-bit hash space makes the large-range
  * collision correction irrelevant below ~10^17 distincts (documented
  * no-op, not implemented).
  *
  * Scale shape: values never shuffle (the 60-bit hash is computed
  * map-side); the register shuffle carries at most `groups * 2^p`
  * rows AFTER map-side combine (max is combinable — a 10^12-doc
  * corpus reduces to 4096 longs per group); the per-group estimate is
  * one more combinable agg. Registers are MERGEABLE (register-wise
  * max), so snapshots persist them ([[registers]] / [[mergeRegisters]]
  * / [[estimate]]) and incremental ingest unions a batch's registers
  * into the standing sketch without re-reading the corpus — the
  * [[graft.engine.IncrementalDedup]] companion audit.
  */
object Cardinality {

  private val HashBits = 60 // 15 md5 hex chars, sign-safe in a long

  /** Flajolet alpha_m in exact micro units (requires m >= 128). */
  def alphaMicro(p: Int): Long = {
    val m = 1L << p
    math.round(0.7213 / (1.0 + 1.079 / m) * 1000000.0)
  }

  /** The exact integral numerator alphaMicro * m^2 * 2^(rhoMax) as a
    * decimal string — embedded verbatim in the engine expression AND
    * the oracle SQL so both sides divide the same exact integer.
    */
  def numeratorStr(p: Int): String = {
    val m = BigInt(1) << p
    (BigInt(alphaMicro(p)) * m * m * (BigInt(1) << (HashBits - p + 1))).toString
  }

  /** Per-group HLL registers: (keyCols..., j, mj) — at most
    * `groups * 2^p` rows, map-side combined. Null values are skipped
    * (matching `count(DISTINCT v)` semantics).
    */
  def registers(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      p: Int = 12): DataFrame = {
    require(p >= 7 && p <= 14, s"p must be in 7..14: $p") // m>=128: alpha formula regime
    val r = HashBits - p // remainder bits
    val rhoMax = r + 1
    val keys = keyCols.map(col)
    df.filter(valueCol.isNotNull)
      .select(keys :+ Hashing.hexPrefixLong(valueCol, 15).as("h"): _*)
      .select(keys ++ Seq(
        expr(s"h div ${1L << r}").as("j"),
        expr(s"h % ${1L << r}").as("rest")): _*)
      // bit length via conv(_,10,2) string length: exact for rest>=1,
      // rest=0 means all r remainder bits are zero -> rho = r+1
      .withColumn("rho",
        when(col("rest") === 0L, lit(rhoMax))
          .otherwise(lit(rhoMax) - length(conv(col("rest"), 10, 2))))
      .groupBy(keys :+ col("j"): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** Union two register frames (same keyCols/p) register-wise — the
    * sketch merge an incremental snapshot applies per batch.
    */
  def mergeRegisters(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols :+ "j").map(col): _*)
      .agg(max(col("mj")).as("mj"))

  /** Estimate distinct counts from a register frame:
    * (keyCols..., v_zero, s, est) — all exact longs.
    */
  def estimate(regs: DataFrame, keyCols: Seq[String], p: Int = 12): DataFrame = {
    require(p >= 7 && p <= 14, s"p must be in 7..14: $p")
    val m = 1L << p
    val rhoMax = HashBits - p + 1
    val lnMicroM = math.round(math.log(m.toDouble) * 1000000.0)
    regs
      .groupBy(keyCols.map(col): _*)
      .agg(
        (lit(m) - count(lit(1))).as("v_zero"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($rhoMax - mj AS INT))"))
          + (lit(m) - count(lit(1))) * lit(1L << rhoMax)).as("s"))
      .withColumn("raw",
        expr(s"CAST('${numeratorStr(p)}' AS DECIMAL(38,0)) div (CAST(s AS DECIMAL(38,0)) * 1000000)"))
      .withColumn("est",
        when(col("raw") <= lit(m * 5 / 2) && col("v_zero") > 0L,
          expr(s"($m * (${lnMicroM}L - CAST(round(ln(v_zero) * 1000000) AS BIGINT))) div 1000000"))
          .otherwise(col("raw")))
      .select((keyCols.map(col) ++ Seq(col("v_zero"), col("s"), col("est"))): _*)
  }

  /** One-shot grouped distinct-cardinality estimate. */
  def hllDistinct(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      p: Int = 12): DataFrame =
    estimate(registers(df, keyCols, valueCol, p), keyCols, p)
}
