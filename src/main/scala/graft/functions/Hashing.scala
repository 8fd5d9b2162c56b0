package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared portable-hash column builders. The md5-hex-prefix-to-long
  * idiom (`conv(substring(md5(x), 1, n), 16, 10)`) is the repo's
  * engine-portable integer hash — every oracle engine (DuckDB here)
  * re-derives it byte-for-byte, unlike Spark's private `hash()`/
  * `xxhash64` seeds. The prefix width and the cast chain are
  * load-bearing portability contracts, so they live in ONE place:
  * split bucketing ([[graft.corpus.Splits]]), shard assignment
  * ([[graft.corpus.ShardManifest]]), and the verification-shingle
  * hashes (SparkEntry) all call through here.
  */
object Hashing {

  /** First `n` hex chars of md5(`c`) as a non-negative long — uniform
    * in [0, 16^n). `n` ≤ 15 keeps the value inside a long with no
    * sign wrap (16^15 < 2^63). `c` is hashed as given; cast to
    * binary/string at the call site so each caller's null and type
    * semantics stay explicit and oracle-visible.
    */
  def hexPrefixLong(c: Column, n: Int): Column = {
    require(n >= 1 && n <= 15, s"hex prefix width must be in 1..15: $n")
    conv(substring(md5(c), 1, n), 16, 10).cast("long")
  }
}
