package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: plain in-memory greedy prefix in (score desc, md5, id)
    * order — the semantics BudgetSelect decomposes distributively. */
  private def refKept(rows: Seq[(Long, java.lang.Long, Long)],
      budget: Long, salt: String = ""): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def ord(id: Long): String = {
      val s = (if (salt.isEmpty) "" else salt + ":") + id.toString
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val sorted = rows.sortBy { case (id, sc, _) =>
      // null score ranks below every real score
      (if (sc == null) 1 else 0, if (sc == null) 0L else -sc.longValue, ord(id), id)
    }
    var cum = 0L
    val kept = Set.newBuilder[Long]
    for ((id, _, nt) <- sorted) { cum += nt; if (cum <= budget) kept += id }
    kept.result()
  }

  private def run(rows: Seq[(Long, java.lang.Long, Long)], budget: Long,
      parts: Int): Map[Long, Boolean] =
    BudgetSelect.select(
        rows.toDF("id", "score", "n_tokens").repartition(parts),
        col("score"), col("n_tokens"), budget)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap

  test("greedy prefix under budget matches the reference at any partitioning") {
    // three score classes; budget cuts inside the middle one
    val rows: Seq[(Long, java.lang.Long, Long)] =
      (1L to 10L).map(i => (i, java.lang.Long.valueOf(3L), 10L)) ++
        (11L to 30L).map(i => (i, java.lang.Long.valueOf(2L), 7L)) ++
        (31L to 40L).map(i => (i, java.lang.Long.valueOf(1L), 5L))
    for (budget <- Seq(0L, 100L, 137L, 240L, 10000L); parts <- Seq(1, 7)) {
      val out = run(rows, budget, parts)
      assert(out.size == rows.size, s"budget=$budget parts=$parts")
      val expect = refKept(rows, budget)
      assert(out.filter(_._2).keySet == expect, s"budget=$budget parts=$parts")
    }
  }

  test("single-score corpus: the whole budget cut happens in the prefix-sum path") {
    val rows: Seq[(Long, java.lang.Long, Long)] =
      (1L to 200L).map(i => (i, java.lang.Long.valueOf(5L), 3L))
    for (parts <- Seq(1, 8)) {
      val out = run(rows, 100L, parts)
      val kept = out.filter(_._2).keySet
      assert(kept == refKept(rows, 100L), s"parts=$parts")
      assert(kept.size == 33) // 33 * 3 = 99 <= 100 < 102
    }
  }

  test("zero-token and null-score docs: free riders kept inside budget, null class last") {
    val rows: Seq[(Long, java.lang.Long, Long)] = Seq(
      (1L, java.lang.Long.valueOf(9L), 10L),
      (2L, java.lang.Long.valueOf(9L), 0L), // free rider in the top class
      (3L, null, 1L), // null score: only kept if budget survives everything
      (4L, java.lang.Long.valueOf(1L), 5L))
    val out = run(rows, 10L, 2)
    assert(out.filter(_._2).keySet == refKept(rows, 10L))
    assert(out(2L)) // zero tokens never exceed the budget inside a kept prefix
    assert(!out(3L) && !out(4L))
    val all = run(rows, 16L, 2)
    assert(all.values.forall(identity)) // 10+0+5+1 = 16 fits exactly
  }

  test("budget exactly at a class boundary keeps the class whole") {
    val rows: Seq[(Long, java.lang.Long, Long)] =
      Seq((1L, java.lang.Long.valueOf(2L), 6L), (2L, java.lang.Long.valueOf(2L), 6L),
        (3L, java.lang.Long.valueOf(1L), 6L))
    val out = run(rows, 12L, 3)
    assert(out == Map(1L -> true, 2L -> true, 3L -> false))
    intercept[IllegalArgumentException] {
      BudgetSelect.select(rows.toDF("id", "score", "n_tokens"),
        col("score"), col("n_tokens"), -1L)
    }
  }
}
