package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.SparkSpec
import graft.model.{DigestSpec, KV}

/** Properties the reference only implies (SURVEY §5), checked over
  * seeded ScalaCheck-generated corpora:
  *  (i) no false merges — final groups equal ground-truth content
  *      equality for ANY cascade prefix ending in the authoritative
  *      digest (Engine.pm:490-495);
  *  (ii) intermediate-digest choice/order does not change final groups;
  *  (iii) digest counts are monotonically non-increasing per level;
  *  (iv) last-level collision count is 0 on exact grouping.
  */
class EnginePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[KV]] = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      l <- Gen.oneOf("A", "B", "C", "D")
      v <- Gen.choose(0, 12)
    } yield KV(l, v))
  } yield rows

  private def samples(k: Int): Seq[List[KV]] =
    (0 until k).flatMap(i =>
      rowsGen(Gen.Parameters.default, rng.Seed(42L + i)))

  private def groupsOf(rows: List[KV], cascade: Seq[DigestSpec]): Set[Set[String]] = {
    val df = rows.zipWithIndex
      .map { case (kv, i) => (kv.letter, kv.n, s"${kv.letter}${kv.n}#$i") }
      .toDF("letter", "n", "id")
    DedupEngine.run(df, "id", cascade).blocks
      .select("members").collect().map(_.getSeq[String](0).toSet).toSet
  }

  private def authoritative =
    DigestSpec("auth", "exact", concat(col("letter"), lit("|"), col("n")))
  private def cheap = Seq(
    DigestSpec("letter", "letter", col("letter")),
    DigestSpec("mod2", "mod2", col("n") % 2),
    DigestSpec("mod3", "mod3", col("n") % 3))

  test("(i) no false merges: groups = ground-truth equality for any prefix + authoritative tail") {
    for {
      rows <- samples(5)
      prefix <- Seq(Seq(), Seq(0), Seq(1, 2), Seq(0, 1, 2))
    } {
      val cascade = prefix.map(cheap) :+ authoritative
      val got = groupsOf(rows, cascade)
      val want = rows.zipWithIndex
        .groupBy { case (kv, _) => (kv.letter, kv.n) }
        .values.map(_.map { case (kv, i) => s"${kv.letter}${kv.n}#$i" }.toSet).toSet
      assert(got == want, s"cascade prefix $prefix on $rows")
    }
  }

  test("(ii) cascade-order invariance of final groups") {
    for (rows <- samples(5)) {
      val a = Seq(cheap(1), cheap(0), authoritative)
      val b = Seq(cheap(0), cheap(1), authoritative)
      assert(groupsOf(rows, a) == groupsOf(rows, b))
    }
  }

  test("(iii) digest counts monotonic non-increasing; (iv) last-level collisions 0") {
    for (rows <- samples(5)) {
      val df = rows.zipWithIndex
        .map { case (kv, i) => (kv.letter, kv.n, s"${kv.letter}${kv.n}#$i") }
        .toDF("letter", "n", "id")
      val r = DedupEngine.run(df, "id", Seq(cheap(0), cheap(2), authoritative))
      val dc = r.digestCounts
      assert(dc.zip(dc.tail).forall { case (x, y) => x >= y }, s"non-monotonic $dc")
      assert(r.collisionCounts.last == 0L)
    }
  }
}
