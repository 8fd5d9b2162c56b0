package graft.functions

import org.apache.spark.sql.{Dataset, Encoder}

/** Bounded group draining for streamed bucket aggregation (SCALE.md
  * invariant 3, round-3 rev).
  *
  * Round-2 capped the hot-bucket blowup with a typed `Aggregator`
  * (udaf) holding ≤ cap+1 members. MEASURED this round: any
  * TypedImperativeAggregate runs under `ObjectHashAggregateExec`,
  * which falls back to SORT-based aggregation after 128 distinct keys
  * per partition (`spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold`) — and in sort-based mode every partial buffer
  * is Encoder-serialized between runs. On the 20k-doc pipeline bench
  * the fallback cost 41% of wall time (22.0s → 13.0s with the
  * threshold raised). The library-level fix is to stop aggregating
  * into object buffers at all: shuffle the banded rows once and STREAM
  * each bucket through `groupByKey(...).flatMapGroups`, draining into
  * a bounded buffer — the same shuffle+sort the fallback was paying,
  * minus the per-row buffer ser/de and the doomed hash-map phase.
  *
  * Skew note: unlike the udaf, flatMapGroups has no map-side combine,
  * so one over-cap bucket's rows all land in one task. The drain is
  * O(rows) streaming with O(cap) memory — a 10M-row boilerplate band
  * is a few seconds of one-task scan, surfaced by its skip row, never
  * an OOM. (If a corpus is dominated by one pathological key, a
  * salted two-round drain splits it; not needed at the measured
  * scales.)
  */
object CappedGroups {

  /** Drain `it` counting every element but keeping at most cap+1. */
  def drain[T](it: Iterator[T], cap: Int): (Long, collection.IndexedSeq[T]) = {
    val buf = new scala.collection.mutable.ArrayBuffer[T](math.min(cap + 1, 16))
    var n = 0L
    while (it.hasNext) {
      val v = it.next()
      if (n <= cap) buf += v
      n += 1
    }
    (n, buf)
  }

  /** Two-round SALTED capped drain — the generalization of the r4
    * MinHash-band mechanism to every pairing stage (r4 VERDICT #4).
    *
    * The single-round `groupByKey(...).flatMapGroups(drain)` streams a
    * whole bucket through ONE task. That is O(cap) memory and surfaced
    * by its skip row, but a corpus dominated by a single pathological
    * key (every doc sharing one boilerplate band/gram/code) serializes
    * on that one task's O(rows) scan. Here round 1 groups by
    * (key, salt(member) mod salts) — the hot key's rows spread over
    * `salts` parallel tasks, each draining to a BOUNDED partial
    * (count, ≤ cap+1 members) — and round 2 merges the ≤
    * salts·(cap+1)-member partials per key and hands (total, members)
    * to `emit`. When total ≤ cap every row survived its partial, so
    * the merged member list is the complete bucket and the output is
    * IDENTICAL to the single-round path; when total > cap the caller
    * emits its skip row exactly as before. Salting on the MEMBER (not
    * the row) keeps duplicate-member rows of one key in one
    * sub-bucket, so member-distinct inputs stay distinct per partial.
    *
    * `rows` must be (key, member) pairs; encoders resolve at the call
    * site via `spark.implicits._`.
    */
  def saltedDrain[K, V, O](rows: Dataset[(K, V)], cap: Int, salts: Int,
      salt: V => Int, emit: (K, Long, collection.IndexedSeq[V]) => Iterator[O])(
      implicit ek: Encoder[(K, Int)], ekk: Encoder[K],
      ep: Encoder[(K, Long, Seq[V])], eo: Encoder[O]): Dataset[O] = {
    require(salts >= 1, "salts must be >= 1")
    saltedPartials(rows, cap, salts, salt)
      .groupByKey(_._1)
      .flatMapGroups { (k, parts) =>
        var total = 0L
        val buf = new scala.collection.mutable.ArrayBuffer[V](16)
        while (parts.hasNext) {
          val (_, n, sample) = parts.next()
          total += n
          if (buf.length <= cap) buf ++= sample
        }
        emit(k, total, buf)
      }
  }

  /** Round 1 of [[saltedDrain]], also exposed directly so stage tests
    * can assert no round-1 group ever holds a whole hot bucket: one
    * bounded partial (key, count, ≤ cap+1 member sample) per
    * (key, salt(member) mod salts) sub-bucket. saltedDrain's round 1
    * IS this computation — one implementation, so a salt-distribution
    * regression cannot hide from the round-1 tests behind a
    * test-only copy salted with a different hash than the shipping
    * path (round-5 review finding).
    */
  def saltedPartials[K, V](rows: Dataset[(K, V)], cap: Int, salts: Int,
      salt: V => Int)(implicit ek: Encoder[(K, Int)],
      ep: Encoder[(K, Long, Seq[V])]): Dataset[(K, Long, Seq[V])] =
    rows
      .groupByKey(r => (r._1, math.floorMod(salt(r._2), salts)))
      .mapGroups { (key, it) =>
        val (n, sample) = drain(it.map(_._2), cap)
        (key._1, n, sample.toSeq)
      }
}
