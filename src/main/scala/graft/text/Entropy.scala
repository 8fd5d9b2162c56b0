package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-distribution entropy — the gibberish / encoding-junk /
  * low-diversity quality signal (complements the token-level Gopher
  * battery in [[TextStats]]: a page of base64 blobs or mojibake has
  * high CHAR entropy and fails nothing token-side; a page of one
  * repeated char has near-zero; natural language sits in a narrow
  * band). Reference analog: none — [EXT], training-data ops.
  *
  * Determinism contract (the [[NgramLm]] / [[Bm25]] micro-nat
  * discipline): the only float step is `lnMicro(x) = round(ln(x) *
  * 10^6)` — rounded to an exact LONG per distinct count, so libm ulp
  * differences between engines are invisible. With character counts
  * c_i over the first `maxChars` chars (L = sum c_i):
  *
  *   H = ln L - (1/L) * sum c_i ln c_i
  *   entropy_micro = lnMicro(L) - floor(sum(c_i * lnMicro(c_i)) / L)
  *
  * Long sums are associative, so the result is bit-identical across
  * partitionings / AQE re-plans / engines; worst case sum(c_i *
  * lnMicro(c_i)) <= maxChars * lnMicro(maxChars) ~ 10^10 — no
  * overflow. Upper bound is ln(maxChars) ~ 7.6 nats, so micro-nat
  * granularity resolves ~10^7 distinct levels.
  *
  * Scale shape: the prefix cap bounds per-row map work; the
  * (id, ch)-keyed count shuffle carries at most |alphabet| rows per
  * doc AFTER map-side combine (a 2048-char prefix collapses to its
  * ~60 distinct chars before leaving the task), and the per-doc
  * reduce is one more map-side-combinable agg. Text itself never
  * shuffles.
  */
object Entropy {

  private def lnMicro(x: Column): Column =
    round(log(x.cast("double")) * lit(1000000.0)).cast("long")

  /** (id, n_chars_used, distinct_chars, entropy_micro) per non-empty
    * doc: entropy of the character distribution of the first
    * `maxChars` chars, in exact integer micro-nats.
    */
  def charEntropy(docs: DataFrame, maxChars: Int = 2048,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxChars >= 1, s"maxChars must be positive: $maxChars")
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      // Spark's split("", -1 limit) keeps a trailing "" element —
      // dropped here; real chars are never empty strings
      .select(col(idCol),
        explode(split(substring(col(textCol), 1, maxChars), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col(idCol), col("ch"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(col("cnt")).as("n_chars_used"),
        count(lit(1)).as("distinct_chars"),
        sum(col("cnt") * lnMicro(col("cnt"))).as("s"))
      .select(col(idCol), col("n_chars_used"), col("distinct_chars"),
        (lnMicro(col("n_chars_used")) -
          expr("s DIV n_chars_used")).as("entropy_micro"))
  }
}
