package graft.misc

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.checkpoint.Catalog
import graft.multimodal.Media
import graft.sim.Ann
import graft.substring.SubstringDedup
import graft.text.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token count: blank → 0, whitespace runs collapse") {
    val df = Seq("a b  c", "", "   ", "one").toDF("text")
      .select(TextStats.tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 0, 0, 1))
  }

  test("language id picks the stopword-dominant language") {
    val df = Seq(
      "the cat and the dog is that with the house",
      "der hund und die katze ist nicht mit der maus",
      "le chat est dans la maison les arbres une fleur",
      "el gato es por las casas para los arboles una flor",
      "xyzzy plugh qwerty").toDF("text")
      .select(TextStats.langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprints are whitespace/case insensitive but content sensitive") {
    val df = Seq(("A  B\tC", 1), ("a b c", 2), ("a b d", 3)).toDF("text", "i")
      .select(TextStats.fingerprintMd5(col("text")).as("fp"),
        TextStats.fingerprintRolling(col("text")).as("fr"))
    val rows = df.collect()
    assert(rows(0).getString(0) == rows(1).getString(0))
    assert(rows(0).getString(0) != rows(2).getString(0))
    assert(rows(0).getLong(1) == rows(1).getLong(1))
    assert(rows(0).getLong(1) != rows(2).getLong(1))
  }
}

class AnnSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("LSH ANN recall vs brute force (multi-probe, 8-bit buckets)") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Ann.knnBruteForce(emb, q, 5).select("query_id", "neighbor_id")
    val approx = Ann.knnLsh(emb, q, 5).select("query_id", "neighbor_id")
      .withColumn("hit", lit(1))
    val recall = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .filter(col("hit").isNotNull).count().toDouble / exact.count()
    info(f"ANN recall@5 = $recall%.3f")
    assert(recall >= 0.5) // approximate path; brute force is the exact baseline
  }

  test("embedding near-dup edges are symmetric-free and high-score") {
    val edges = Ann.embeddingDupEdges(emb, 0.95)
    val bad = edges.filter(col("src") >= col("dst")).count()
    assert(bad == 0)
    assert(edges.filter(col("score") < 0.95).count() == 0)
  }
}

class SubstringSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("duplicated windows found across docs sharing a 30-token run") {
    val shared = mk(30, "shared")
    val docs = Seq(
      ("d1", mk(40, "a") + " " + shared),
      ("d2", shared + " " + mk(40, "b")),
      ("d3", mk(80, "c"))).toDF("url", "text")
    val dup = SubstringDedup.duplicatedWindows(docs, w = 20, stride = 1)
    assert(dup.count() > 0)
    val edges = SubstringDedup.substringDupEdges(docs, w = 20, stride = 1, minShared = 1)
    val pairs = edges.select("src", "dst").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("d1", "d2")))
  }

  test("suffix-array finds cross-doc repeats >= minLen chars") {
    val shared = mk(30, "rep")
    val docs = Seq(
      ("d1", mk(50, "x") + " " + shared),
      ("d2", shared + " " + mk(50, "y")),
      ("d3", mk(100, "z"))).toDF("url", "text").coalesce(1)
    val reps = SubstringDedup.suffixArrayRepeats(spark, docs, minLen = 60).collect()
    assert(reps.nonEmpty)
    assert(reps.exists(r => r.srcDoc == "d1" && r.dstDoc == "d2" && r.length >= 60))
    assert(!reps.exists(r => r.srcDoc == "d3" || r.dstDoc == "d3"))
  }
}

class MediaSpec extends SparkSpec {

  test("binary media plumbing: stub decode is deterministic, schema typed") {
    val docs = graft.corpus.Corpus.docs(spark, 100).toDF()
      .filter(octet_length(col("html")) > 0)
    val media = Media.fromBinaryColumn(spark, docs, "url", "html")
    val dec = Media.decode(spark, media).persist()
    assert(dec.count() == docs.count())
    val r = dec.filter(col("n_bytes") > 0).head()
    assert(r.width >= 64)
    assert(r.features.length == 16)
    // deterministic: same input → same features
    val again = Media.decode(spark, media)
    assert(dec.select("media_id", "width", "height", "n_frames")
      .exceptAll(again.select("media_id", "width", "height", "n_frames")).count() == 0)
    val frames = Media.sampleFrames(dec.toDF(), stride = 5)
    assert(frames.count() >= dec.count()) // ≥1 frame per media row
  }
}

class CheckpointSpec extends SparkSpec {

  test("stage runs once, resumes on same lineage, recomputes on change") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val cat = new Catalog(dir, spark)
    var computes = 0
    def body = {
      computes += 1
      spark.range(10).toDF("id")
    }
    val a = cat.stage("s1", "lineage-v1")(body)
    assert(a.count() == 10 && computes == 1)
    val b = cat.stage("s1", "lineage-v1")(body)
    assert(b.count() == 10 && computes == 1) // resumed, not recomputed
    val c = cat.stage("s1", "lineage-v2")(body)
    assert(c.count() == 10 && computes == 2) // lineage changed → rerun
    cat.recordMetrics("s1", Map("rows" -> 10L, "skipped" -> 0L))
    assert(cat.metrics().count() == 2)
    // re-read: `a` points at files the v2 overwrite replaced
    assert(cat.partitionCounts(cat.read("s1")).agg(sum(col("count"))).head().getLong(0) == 10L)
  }
}
