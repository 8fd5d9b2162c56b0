package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Single-pass capped collect (SCALE.md invariant 3, round-2 rev):
  * accumulate at most cap+1 members while counting EVERYTHING, so an
  * over-cap bucket yields (n, []) — bounded memory like the two-phase
  * count→semi-join→collect shape, but in ONE aggregation pass instead
  * of two shuffles + a join (each extra stage is serial driver time
  * that Amdahl charges against scaling efficiency).
  *
  * `n` is exact for the list variants; the set variant caps it at
  * cap+1 (an over-cap marker — callers only test n ∈ [2, cap]).
  */
case class Capped[T](n: Long, items: List[T])

/** collect_list(id) with cap — bucket members as strings. */
class CappedCollectString(cap: Int)
  extends Aggregator[String, Capped[String], Capped[String]] {
  def zero: Capped[String] = Capped(0L, Nil)
  def reduce(b: Capped[String], a: String): Capped[String] =
    Capped(b.n + 1, if (b.n <= cap) a :: b.items else b.items)
  def merge(x: Capped[String], y: Capped[String]): Capped[String] =
    Capped(x.n + y.n, if (x.n + y.n > cap) Nil else x.items ++ y.items)
  def finish(b: Capped[String]): Capped[String] =
    if (b.n > cap) Capped(b.n, Nil) else b
  def bufferEncoder: Encoder[Capped[String]] = Encoders.product[Capped[String]]
  def outputEncoder: Encoder[Capped[String]] = Encoders.product[Capped[String]]
}

/** collect_list(struct(id, sig)) with cap — SimHash bucket members. */
class CappedCollectMember(cap: Int)
  extends Aggregator[(String, Long), Capped[(String, Long)], Capped[(String, Long)]] {
  def zero: Capped[(String, Long)] = Capped(0L, Nil)
  def reduce(b: Capped[(String, Long)], a: (String, Long)): Capped[(String, Long)] =
    Capped(b.n + 1, if (b.n <= cap) a :: b.items else b.items)
  def merge(x: Capped[(String, Long)], y: Capped[(String, Long)]): Capped[(String, Long)] =
    Capped(x.n + y.n, if (x.n + y.n > cap) Nil else x.items ++ y.items)
  def finish(b: Capped[(String, Long)]): Capped[(String, Long)] =
    if (b.n > cap) Capped(b.n, Nil) else b
  def bufferEncoder: Encoder[Capped[(String, Long)]] =
    Encoders.product[Capped[(String, Long)]]
  def outputEncoder: Encoder[Capped[(String, Long)]] =
    Encoders.product[Capped[(String, Long)]]
}

/** collect_set(id) with cap — distinct doc ids per substring window;
  * n saturates at cap+1 once the distinct count exceeds the cap.
  */
class CappedCollectStringSet(cap: Int)
  extends Aggregator[String, Capped[String], Capped[String]] {
  def zero: Capped[String] = Capped(0L, Nil)
  def reduce(b: Capped[String], a: String): Capped[String] =
    if (b.n > cap) b
    else if (b.items.contains(a)) b
    else Capped(b.n + 1, a :: b.items)
  def merge(x: Capped[String], y: Capped[String]): Capped[String] = {
    if (x.n > cap || y.n > cap) Capped(cap + 1L, Nil)
    else {
      val u = (x.items ++ y.items).distinct
      if (u.length > cap) Capped(cap + 1L, Nil) else Capped(u.length.toLong, u)
    }
  }
  def finish(b: Capped[String]): Capped[String] =
    if (b.n > cap) Capped(b.n, Nil) else b
  def bufferEncoder: Encoder[Capped[String]] = Encoders.product[Capped[String]]
  def outputEncoder: Encoder[Capped[String]] = Encoders.product[Capped[String]]
}

object CappedCollect {
  /** Column-level entry points (one aggregation pass; result is a
    * struct<n: bigint, items: array<...>>).
    */
  def strings(idCol: Column, cap: Int): Column =
    udaf(new CappedCollectString(cap)).apply(idCol)
  def members(idCol: Column, sigCol: Column, cap: Int): Column =
    udaf(new CappedCollectMember(cap), Encoders.product[(String, Long)])
      .apply(idCol, sigCol)
  def stringSet(idCol: Column, cap: Int): Column =
    udaf(new CappedCollectStringSet(cap)).apply(idCol)
}
