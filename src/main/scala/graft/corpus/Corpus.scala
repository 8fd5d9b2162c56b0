package graft.corpus

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Doc, DocTruth}

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).
  *
  * Everything is a pure function of (seed, row index): no RNG state is
  * shared across rows, so any subrange of ids regenerates identically —
  * generation is embarrassingly parallel via spark.range(n).map.
  *
  * Per century of row indices (i % 100):
  *  -  0-59 unique pages
  *  - 60-74 exact duplicates: groups {60,61,74}, {62-64}, {65-68},
  *          {69-73} share byte-identical html under distinct urls
  *          (reference duplicate planting, Files.t:32-55)
  *  - 75-79 url aliases: same html, urls differing only by utm junk /
  *          trailing slash / fragment — the "hardlink" class
  *          (Files.t:133-183); groups {75,76}, {77-79}
  *  - 80-84 empty docs (html = 0 bytes) — group together by default
  *          (Files.t:253-258)
  *  - 85-89 undecodable html (invalid UTF-8) → text NULL, quarantined
  *          (Files.t:274-300)
  *  - 90-99 near-duplicates [EXT]: tail-edited copies at shingle
  *          Jaccard ≈0.95 ({90,91}, {95,96}), ≈0.8 ({92-94}) and the
  *          intended-negative ≈0.5 tier ({97-99})
  *
  * Skew stressors (FIXTURES.md §6): rows with i%20==7 (5%) share a hot
  * 40-token boilerplate prefix (hot LSH bands); the empty class is a
  * hot filesize group.
  */
object Corpus {

  val Seed = 42L

  // --- deterministic primitives -------------------------------------

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def rng(seed: Long, i: Long, k: Long): Long = mix64(mix64(seed ^ i) ^ k)
  private def pick(seed: Long, i: Long, k: Long, n: Int): Int =
    (((rng(seed, i, k) >>> 1) % n).toInt)

  private val syll = Array("ba", "re", "mo", "ti", "lun", "ka", "ves", "or", "da", "pli",
    "sun", "er", "tol", "mi", "qua", "zen", "fi", "rod", "an", "ulp")
  private val vocab: Array[String] = (0 until 800).map { k =>
    val a = syll(k % 20); val b = syll((k / 20) % 20); val c = syll((k * 7 + 3) % 20)
    if (k % 97 == 13) a + b + "&" + c            // entity-bearing token
    else if (k % 89 == 7) a + "<" + b + c        // tag-char token
    else if (k % 3 == 0) a + b else a + b + c
  }.toArray

  private val boilerplate: String =
    (0 until 40).map(k => vocab((k * 31 + 11) % 800)).mkString(" ")

  private def token(seed: Long, docKey: Long, pos: Int): String =
    vocab(pick(seed, docKey, 1000L + pos, 800))

  // --- row-class geometry --------------------------------------------

  /** Leader (content source) id for row i, and its truth kind. */
  private[corpus] def classify(i: Long): (Long, String) = {
    val j = (i % 100).toInt
    val c = i - j
    j match {
      case x if x < 60  => (i, "unique")
      case x if x <= 61 => (c + 60, "exact_dup")
      case 74           => (c + 60, "exact_dup")
      case x if x <= 64 => (c + 62, "exact_dup")
      case x if x <= 68 => (c + 65, "exact_dup")
      case x if x <= 73 => (c + 69, "exact_dup")
      case x if x <= 76 => (c + 75, "alias")
      case x if x <= 79 => (c + 77, "alias")
      case x if x <= 84 => (i, "empty")
      case x if x <= 89 => (i, "undecodable")
      case x if x <= 91 => (c + 90, "near_dup_95")
      case x if x <= 94 => (c + 92, "near_dup_80")
      case x if x <= 96 => (c + 95, "near_dup_95")
      case _            => (c + 97, "near_dup_50")
    }
  }

  private def tailEditFraction(kind: String): Double = kind match {
    case "near_dup_95" => 0.026
    case "near_dup_80" => 0.11
    case "near_dup_50" => 0.33
    case _             => 0.0
  }

  // --- content synthesis ----------------------------------------------

  private val langs = Array("en", "de", "fr", "es", "pt")
  private def langOf(seed: Long, leader: Long): String = {
    val r = pick(seed, leader, 5L, 100)
    if (r < 70) "en" else if (r < 80) "de" else if (r < 90) "fr" else if (r < 95) "es" else "pt"
  }

  /** Base token sequence of a leader doc: 120-360 tokens (+ hot
    * boilerplate prefix for the i%20==7 stressor rows).
    */
  private def baseTokens(seed: Long, leader: Long): Vector[String] = {
    val len = 120 + pick(seed, leader, 2L, 241)
    val body = (0 until len).map(p => token(seed, leader, p)).toVector
    if (leader % 20 == 7) boilerplate.split(' ').toVector ++ body else body
  }

  /** Tokens for row i: leader's tokens, with a tail fraction replaced
    * by member-unique novel tokens for near-dup members (leader itself
    * is unmodified).
    */
  private[corpus] def tokensOf(seed: Long, i: Long): Vector[String] = {
    val (leader, kind) = classify(i)
    val base = baseTokens(seed, leader)
    val q = tailEditFraction(kind)
    if (q == 0.0 || i == leader) base
    else {
      val nEdit = math.max(1, (base.length * q).toInt)
      val kept = base.dropRight(nEdit)
      val novel = (0 until nEdit).map(k => "zz" + java.lang.Long.toHexString(rng(seed, i, 9000L + k) >>> 40))
      kept ++ novel
    }
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** html and the text TextExtract must recover byte-identically. */
  private[corpus] def render(seed: Long, i: Long): (Array[Byte], String) = {
    val (_, kind) = classify(i)
    kind match {
      case "empty" => (Array.emptyByteArray, "")
      case "undecodable" =>
        val n = 64 + pick(seed, i, 3L, 192)
        val b = new Array[Byte](n)
        var k = 0
        while (k < n) { b(k) = (rng(seed, i, 4000L + k) & 0xff).toByte; k += 1 }
        b(0) = 0xff.toByte; b(n / 2) = 0xfe.toByte // guaranteed-invalid UTF-8
        (b, null)
      case _ =>
        val toks = tokensOf(seed, i)
        val title = toks.take(3).mkString(" ")
        val paras = toks.drop(3).grouped(50).map(_.mkString(" ")).toVector
        val html = new StringBuilder(8192)
        html ++= "<!DOCTYPE html><html><head><title>" ++= esc(title) ++= "</title>"
        html ++= "<style>body { font: 14px sans; }</style>"
        html ++= "<script>var trk = 'site';</script></head><body>"
        html ++= "<!-- generated -->"
        paras.foreach(p => html ++= "<p>" ++= esc(p) ++= "</p>")
        html ++= "</body></html>"
        val text = (title +: paras).mkString(" ")
        (html.result().getBytes(StandardCharsets.UTF_8), text)
    }
  }

  private val aliasJunk = Array("", "/", "?utm_source=feed", "?utm_campaign=x", "#top")

  private[corpus] def urlOf(i: Long): String = {
    val (leader, kind) = classify(i)
    if (kind == "alias") {
      val member = (i - leader).toInt
      s"https://host${leader % 17}.example/p/$leader${aliasJunk(member % aliasJunk.length)}"
    } else s"https://host${i % 17}.example/p/$i"
  }

  private[corpus] def docOf(seed: Long, i: Long): Doc = {
    val (leader, kind) = classify(i)
    val (html, text) = kind match {
      case "exact_dup" | "alias" => render(seed, leader)
      case _                     => render(seed, i)
    }
    val ts = new java.sql.Timestamp(1767225600000L + i * 37000L) // 2026-01-01T00:00Z + i*37s
    Doc(urlOf(i), ts, html, text, langOf(seed, leader))
  }

  private[corpus] def truthOf(i: Long): DocTruth = {
    val (leader, kind) = classify(i)
    // the 0.5 tier are intended negatives: each its own truth group
    val g = if (kind == "near_dup_50") i else leader
    DocTruth(urlOf(i), g, kind)
  }

  /** TRUTH-derived expected exact-duplicate report lines for the first
    * n rows: groups of urls that share byte-identical html BY
    * CONSTRUCTION of the generator geometry (classify), independent of
    * any pipeline code — exact_dup/alias members render their leader's
    * content, all empty docs share the zero-byte page, everything else
    * is distinct. Used as the VALUES oracle of q_synth_dup_report.
    */
  def expectedDupReportLines(n: Long): Seq[String] = {
    val groups = (0L until n).groupBy { i =>
      val (leader, kind) = classify(i)
      kind match {
        case "empty"               => "EMPTY"
        case "exact_dup" | "alias" => s"L$leader"
        case _                     => s"I$i"
      }
    }
    groups.values.filter(_.size > 1)
      .map(_.map(urlOf).sorted.mkString("\t")).toSeq.sorted
  }

  // --- public API ------------------------------------------------------

  def docs(spark: SparkSession, n: Long, seed: Long = Seed): Dataset[Doc] = {
    import spark.implicits._
    spark.range(n).map(i => docOf(seed, i))
  }

  def truth(spark: SparkSession, n: Long, seed: Long = Seed): Dataset[DocTruth] = {
    import spark.implicits._
    spark.range(n).map(i => truthOf(i))
  }
}
