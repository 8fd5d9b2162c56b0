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

  test("LSH ANN recall vs brute force (multi-probe, scale-adaptive bits)") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Ann.knnBruteForce(emb, q, 5).select("query_id", "neighbor_id")
    val approx = Ann.knnLsh(emb, q, 5).select("query_id", "neighbor_id")
      .withColumn("hit", lit(1))
    val recall = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .filter(col("hit").isNotNull).count().toDouble / exact.count()
    info(f"ANN recall@5 = $recall%.3f")
    assert(recall >= 0.9) // approximate path; brute force is the exact baseline
  }

  test("adaptive bits grow with log N (fixed buckets degenerate at scale)") {
    assert(Ann.adaptiveBits(500) == 3)
    assert(Ann.adaptiveBits(1000000) == 14)
    assert(Ann.adaptiveBits(1000000000L) == 24)
    assert(Ann.adaptiveBits(10) == 1)
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

class ProgressSpec extends SparkSpec {

  test("observe taps stream rows/bytes to the listener on action completion") {
    val listener = new graft.progress.Progress.ProgressListener(echo = false)
    spark.listenerManager.register(listener)
    try {
      val docs = graft.corpus.Corpus.docs(spark, 200).toDF()
      graft.progress.Progress.tap(docs, "scan_docs_test", Some("html"))
        .write.format("noop").mode("overwrite").save()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      def obs = listener.observations.filter(_.name == "scan_docs_test")
      while (obs.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(obs.nonEmpty)
      val m = obs.head.metrics
      assert(m("rows") == 200L)
      assert(m("bytes").asInstanceOf[Long] > 0L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("--progress/--debug/--byte-verify parse (CLI.pm:30-39 parity)") {
    val c = graft.Main.parse(List("--input", "x", "--progress", "--debug", "--byte-verify"))
    assert(c.progress && c.debug && c.byteVerify)
    // byte-compare stage appends a real cascade level
    val casc = graft.functions.Digests.cascade(col("html"), c.algs :+ "bytes")
    assert(casc.last.id == "bytes")
  }
}

class MediaSpec extends SparkSpec {

  test("PNG/GIF/JPEG header parsers recover exact dimensions (golden round-trip)") {
    import graft.multimodal.Media._
    for ((w, h) <- Seq((1, 1), (16, 16), (515, 415), (4096, 2160))) {
      assert(parseImageMeta(pngBytes(w, h)).contains(("png", w, h)))
      if (w <= 65535 && h <= 65535) {
        assert(parseImageMeta(gifBytes(w, h)).contains(("gif", w, h)))
        assert(parseImageMeta(jpegBytes(w, h)).contains(("jpeg", w, h)))
      }
    }
    assert(parseImageMeta("not an image at all".getBytes).isEmpty)
    assert(parseImageMeta(Array.emptyByteArray).isEmpty)
    // fixture byte counts are the closed form the oracle uses
    assert(pngBytes(9, 9).length.toLong == FixtureBytes("png"))
    assert(gifBytes(9, 9).length.toLong == FixtureBytes("gif"))
    assert(jpegBytes(9, 9).length.toLong == FixtureBytes("jpeg"))
  }

  test("decode routes known containers to real header metadata") {
    import spark.implicits._
    val rows = Seq(
      Media.MediaRow("p", "image", Media.pngBytes(100, 50)),
      Media.MediaRow("g", "image", Media.gifBytes(20, 30)),
      Media.MediaRow("j", "image", Media.jpegBytes(640, 480)),
      Media.MediaRow("u", "blob", "unknown payload bytes".getBytes)).toDS()
    val dec = Media.decode(spark, rows).collect().map(d => d.media_id -> d).toMap
    assert(dec("p").kind == "png" && dec("p").width == 100 && dec("p").height == 50)
    assert(dec("g").kind == "gif" && dec("g").width == 20 && dec("g").height == 30)
    assert(dec("j").kind == "jpeg" && dec("j").width == 640 && dec("j").height == 480)
    assert(dec("u").kind == "blob") // stub fallback keeps declared kind
  }

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

class CliParseSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("repeatable --alg accumulates across interleaved options (CLI.pm parity)") {
    val c = graft.Main.parse(List(
      "--alg", "filesize", "--input", "x.parquet", "--alg", "sha", "--verbose"))
    assert(c.algs == Seq("filesize", "sha"))
    assert(c.inputs == Seq("x.parquet"))
    assert(c.verbose)
  }

  test("--alg replaces the default cascade, not appends to it") {
    assert(graft.Main.parse(List("--alg", "sha")).algs == Seq("sha"))
    assert(graft.Main.parse(Nil).algs == Seq("filesize", "initial_xxhash", "sha"))
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
