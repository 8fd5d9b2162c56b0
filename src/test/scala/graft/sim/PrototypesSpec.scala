package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrototypesSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("GroupTopK matches an in-memory reference under heavy ties and variable k") {
    val rnd = new scala.util.Random(42)
    // 3 groups, 400 rows, scores drawn from a tiny domain to force ties
    val rows = (0 until 400).map { i =>
      (s"g${i % 3}", rnd.nextInt(5).toLong, s"id$i")
    }
    val ks = Map("g0" -> 7L, "g1" -> 60L, "g2" -> 200L)
    val df = rows.toDF("grp", "score", "id")
      .withColumn("k", when(col("grp") === "g0", 7L)
        .when(col("grp") === "g1", 60L).otherwise(200L))
    val got = graft.corpus.GroupTopK.pick(df, "grp", "score", "k", "id", salt = "s1")
      .filter(col("picked")).select("grp", "id").as[(String, String)]
      .collect().toSet
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (_, sc, id) => (-sc, md5hex(s"s1:$id"), id) }
        .take(ks(g).toInt).map { case (_, _, id) => (g, id) }
    }.toSet
    assert(got == want)
  }

  test("GroupTopK: null scores rank last, null group is its own group") {
    val df = Seq(
      (Option("g"), Option(5L), "a"), (Option("g"), None, "b"),
      (Option("g"), Option(3L), "c"),
      (None: Option[String], Option(9L), "d"), (None, Option(1L), "e"))
      .toDF("grp", "score", "id").withColumn("k", lit(2L))
    val picked = graft.corpus.GroupTopK.pick(df, "grp", "score", "k", "id")
      .filter(col("picked")).select("id").as[String].collect().toSet
    assert(picked == Set("a", "c", "d", "e")) // null score "b" loses; null group keeps its top-2
  }

  test("prototype cut: closed-form two-cluster corpus") {
    // cell 0 centroid = +x; members at decreasing cosine; cell 1 = +y
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val v = Seq(
      (0L, Seq(1.0f, 0.0f), 0),   // cos 1.0    (most prototypical)
      (1L, Seq(2.0f, 0.5f), 0),   // cos .970
      (2L, Seq(1.0f, 1.0f), 0),   // cos .707
      (3L, Seq(1.0f, 3.0f), 0),   // cos .316   (hardest)
      (10L, Seq(0.0f, 5.0f), 1),  // cos 1.0
      (11L, Seq(0.5f, 1.0f), 1))  // cos .894
      .toDF("vec_id", "embedding", "cell")
    // prune 50%: cell0 cuts 2 (ids 0,1), cell1 cuts 1 (id 10)
    val out = Prototypes.pruneCut(v, cents, 500000L)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out == Map(0L -> false, 1L -> false, 2L -> true, 3L -> true,
      10L -> false, 11L -> true))
  }

  test("tie fairness: identical-direction members split by the md5 order key") {
    val cents = Array(Array(1.0, 0.0))
    // 100 scaled copies of +x: identical proto_micro = 1000000
    val v = (0 until 100).map(i => (i.toLong, Seq((i + 1).toFloat, 0.0f), 0))
      .toDF("vec_id", "embedding", "cell")
    val cut = Prototypes.pruneCut(v, cents, 300000L, salt = "epoch1")
    val pruned = cut.filter(!col("kept")).select("vec_id").as[Long].collect().toSet
    assert(pruned.size == 30)
    val wantPruned = (0 until 100).map(_.toLong)
      .sortBy(id => (md5hex(s"epoch1:$id"), id)).take(30).toSet
    assert(pruned == wantPruned)
    // a different salt re-shuffles the tie
    val pruned2 = Prototypes.pruneCut(v, cents, 300000L, salt = "epoch2")
      .filter(!col("kept")).select("vec_id").as[Long].collect().toSet
    assert(pruned2.size == 30 && pruned2 != pruned)
  }

  test("partitioning invariance") {
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val rnd = new scala.util.Random(7)
    val v = (0 until 500).map { i =>
      (i.toLong, Seq(rnd.nextFloat(), rnd.nextFloat(), rnd.nextFloat()), i % 2)
    }.toDF("vec_id", "embedding", "cell")
    val a = Prototypes.pruneCut(v.repartition(1), cents, 250000L)
      .orderBy("vec_id").collect().toSeq
    val b = Prototypes.pruneCut(v.repartition(11), cents, 250000L)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("pruneIvf: per-cell cut counts are exact floors; null vectors drop") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 300).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val corpus = (base :+ ((300L, null: Seq[Float])))
      .toDF("vec_id", "embedding")
    val cents = Ivf.train(corpus.filter(col("embedding").isNotNull),
      k = 4, iters = 3)
    val cut = Prototypes.pruneIvf(corpus, cents, 200000L)
    val byCell = cut.groupBy("cell")
      .agg(count(lit(1)).as("n"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("cut"))
      .as[(Int, Long, Long)].collect()
    assert(byCell.map(_._2).sum == 300) // the null-vector row is dropped
    byCell.foreach { case (_, n, c) => assert(c == n * 200000L / 1000000L) }
  }
}
