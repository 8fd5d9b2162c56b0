package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Properties of the two distributed-selection decompositions, checked
  * over seeded ScalaCheck corpora against plain in-memory references:
  *  (i)  BudgetSelect == the one-pass greedy prefix, for any budget,
  *       any partitioning, any tie mass (the boundary-class prefix sum
  *       and the class classification must seam exactly);
  *  (ii) DomainQuota == the per-domain global rank, for any k and
  *       bucket width (the phase-1 cut must be lossless);
  *  (iii) BudgetSelect is monotone in the budget: growing the budget
  *       never drops a previously kept doc (greedy-prefix invariant).
  */
class SelectionPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Doc(id: Long, domain: String, score: Long, tokens: Long)

  private val corpusGen: Gen[List[Doc]] = for {
    n <- Gen.choose(5, 120)
    rows <- Gen.listOfN(n, for {
      d <- Gen.oneOf("a", "b", "c")
      s <- Gen.choose(0L, 6L) // few classes: heavy ties by design
      t <- Gen.choose(0L, 9L) // zero-token docs included
    } yield (d, s, t))
  } yield rows.zipWithIndex.map { case ((d, s, t), i) =>
    Doc(i.toLong, s"$d.example", s, t)
  }

  private def samples(k: Int): Seq[List[Doc]] =
    (0 until k).flatMap(i =>
      corpusGen(Gen.Parameters.default, rng.Seed(1337L + i)))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("(i) BudgetSelect equals the one-pass greedy prefix on random tie-heavy corpora") {
    for (rows <- samples(6); budget <- Seq(0L, 7L, rows.map(_.tokens).sum / 2, 10000L)) {
      val expect = {
        var cum = 0L
        rows.sortBy(d => (-d.score, md5hex(d.id.toString), d.id))
          .map { d => cum += d.tokens; d.id -> (cum <= budget) }.toMap
      }
      val out = BudgetSelect.select(
          rows.map(d => (d.id, d.score, d.tokens)).toDF("id", "score", "n_tokens")
            .repartition(5),
          col("score"), col("n_tokens"), budget)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      assert(out == expect, s"budget=$budget n=${rows.size}")
    }
  }

  test("(ii) DomainQuota equals the per-domain global rank for any k and bucket width") {
    for (rows <- samples(6); k <- Seq(1, 4, 50); hexChars <- Seq(1, 2)) {
      val expect = rows.groupBy(_.domain).flatMap { case (_, rs) =>
        rs.sortBy(d => (-d.score, md5hex(d.id.toString), d.id)).take(k).map(_.id)
      }.toSet
      val out = DomainQuota.cap(
          rows.map(d => (d.id, d.domain, d.score)).toDF("id", "domain", "score")
            .repartition(5),
          col("domain"), col("score"), k, hexChars = hexChars)
        .collect().map(_.getLong(0)).toSet
      assert(out == expect, s"k=$k hexChars=$hexChars n=${rows.size}")
    }
  }

  test("(iii) BudgetSelect keep-set is monotone in the budget") {
    for (rows <- samples(3)) {
      val df = rows.map(d => (d.id, d.score, d.tokens))
        .toDF("id", "score", "n_tokens").repartition(3)
      val keptAt = Seq(5L, 20L, 80L).map { b =>
        BudgetSelect.select(df, col("score"), col("n_tokens"), b)
          .filter(col("kept")).collect().map(_.getLong(0)).toSet
      }
      assert(keptAt(0).subsetOf(keptAt(1)) && keptAt(1).subsetOf(keptAt(2)))
    }
  }
}
