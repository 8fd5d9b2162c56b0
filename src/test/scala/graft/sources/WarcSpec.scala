package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

class WarcSpec extends SparkSpec {

  private def stream(bytes: Array[Byte]) =
    new DataInputStream(new ByteArrayInputStream(bytes))

  private val date = "2026-01-02T03:04:05Z"

  test("records: responses parsed, warcinfo/request/metadata skipped, body bytes exact") {
    val body = "<html><body>hi &amp; bye\r\n\r\nmore</body></html>".getBytes(UTF_8)
    val bytes =
      Warc.skippableRecord("warcinfo", date) ++
      Warc.skippableRecord("request", date) ++
      Warc.responseRecord("https://a.example/x", date, 200, body,
        extraHttpHeaders = "Server: test\r\n") ++
      Warc.skippableRecord("metadata", date) ++
      Warc.responseRecord("https://b.example/y", "2026-02-03T04:05:06Z", 404,
        Array.emptyByteArray, contentType = None) ++
      Warc.responseRecord("https://c.example/z", date, 200,
        "%PDF-".getBytes(UTF_8), contentType = Some(" Application/PDF ; x=y"))
    val docs = Warc.records(stream(bytes), "mem").toList
    assert(docs.map(_.url) == List("https://a.example/x", "https://b.example/y",
      "https://c.example/z"))
    assert(docs.head.html.toSeq == body.toSeq) // CRLFCRLF inside body survives
    assert(docs.head.http_status == 200)
    assert(docs.head.http_mime == "text/html") // params + casing normalized
    assert(docs.head.warc_ts == java.sql.Timestamp.from(
      java.time.Instant.parse(date)))
    assert(docs(1).http_status == 404)
    assert(docs(1).html.isEmpty)
    assert(docs(1).http_mime == null) // no Content-Type header
    assert(docs(2).http_mime == "application/pdf")
  }

  test("records: bodiless/non-HTTP blocks skipped by policy, garbage framing fails loudly") {
    // a response whose block is not an HTTP message → skipped
    val blk = "not http at all".getBytes(UTF_8)
    val nonHttp = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Date: $date\r\nWARC-Target-URI: https://c.example/\r\n" +
      s"Content-Length: ${blk.length}\r\n\r\n").getBytes(UTF_8) ++ blk ++
      "\r\n\r\n".getBytes(UTF_8)
    assert(Warc.records(stream(nonHttp), "mem").toList.isEmpty)

    // truncated block → loud failure, not silent drop
    val good = Warc.responseRecord("https://d.example/", date, 200,
      "abc".getBytes(UTF_8))
    val truncated = good.dropRight(10)
    val ex = intercept[java.io.IOException] {
      Warc.records(stream(truncated), "mem").toList
    }
    assert(ex.getMessage.contains("truncated"))

    // non-WARC leading bytes → loud failure
    val junk = "HELLO\r\n".getBytes(UTF_8) ++ good
    assert(intercept[java.io.IOException] {
      Warc.records(stream(junk), "mem").toList
    }.getMessage.contains("expected WARC/"))
  }

  test("records: the stream is closed on a mid-file parse failure, not leaked (r5 review)") {
    var closed = false
    val good = Warc.responseRecord("https://d.example/", date, 200,
      "abc".getBytes(UTF_8))
    val bad = good ++ "GARBAGE\r\n".getBytes(UTF_8) ++ good
    val underlying = new ByteArrayInputStream(bad) {
      override def close(): Unit = { closed = true; super.close() }
    }
    intercept[java.io.IOException] {
      Warc.records(new DataInputStream(underlying), "mem").toList
    }
    assert(closed, "the loud IOException must also close the input stream")
  }

  test("read: .warc and concatenated-member .warc.gz files land in the corpus schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toFile
    val r1 = Warc.skippableRecord("warcinfo", date) ++
      Warc.responseRecord("https://p.example/1", date, 200,
        "<html><body>plain  text&amp;stuff</body></html>".getBytes(UTF_8))
    val f1 = new File(dir, "seg-00.warc")
    val o1 = new FileOutputStream(f1); o1.write(r1); o1.close()

    // gz: one gzip MEMBER per record, concatenated — the Common Crawl
    // layout; GZIPInputStream must read across member boundaries
    val f2 = new File(dir, "seg-01.warc.gz")
    val o2 = new FileOutputStream(f2)
    for (rec <- Seq(
        Warc.responseRecord("https://p.example/2", date, 301, Array[Byte]()),
        Warc.responseRecord("https://p.example/3", date, 200,
          "<p>third</p>".getBytes(UTF_8)))) {
      val g = new GZIPOutputStream(o2); g.write(rec); g.finish()
    }
    o2.close()
    // a non-warc file in the dir is ignored
    val o3 = new FileOutputStream(new File(dir, "README.txt")); o3.write(65); o3.close()

    val df = Warc.read(spark, dir.getAbsolutePath)
    val rows = df.orderBy("url").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("https://p.example/1", "https://p.example/2", "https://p.example/3"))
    val byUrl = rows.map(r => r.getString(0) -> r).toMap
    assert(byUrl("https://p.example/1").getString(3) == "plain text&stuff") // extracted
    assert(byUrl("https://p.example/3").getString(3) == "third")
    assert(byUrl("https://p.example/2").getInt(5) == 301)
    assert(rows.forall(_.getString(4) == "und"))
    assert(rows.forall(_.getTimestamp(1) != null))
  }

  test("read: a corrupt gzip member boundary mid-file fails loudly, never silently truncates") {
    // GZIPInputStream swallows an unparseable next-member header as
    // clean EOF — without the unconsumed-bytes check, every record
    // after the corruption would silently vanish (r5 review)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-corrupt").toFile
    val f = new File(dir, "seg-00.warc.gz")
    val o = new FileOutputStream(f)
    val g1 = new GZIPOutputStream(o)
    g1.write(Warc.responseRecord("https://c.example/1", date, 200,
      "<p>one</p>".getBytes(UTF_8)))
    g1.finish()
    // second member with its gzip magic destroyed
    val m2 = {
      val bo = new java.io.ByteArrayOutputStream()
      val g2 = new GZIPOutputStream(bo)
      g2.write(Warc.responseRecord("https://c.example/2", date, 200,
        "<p>two</p>".getBytes(UTF_8)))
      g2.finish()
      val b = bo.toByteArray; b(0) = 'X'; b(1) = 'Y'; b
    }
    o.write(m2); o.close()
    val ex = intercept[Exception] {
      Warc.read(spark, dir.getAbsolutePath).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("corrupt gzip member boundary")), msgs.mkString(" | "))
  }

  test("readWet: conversion text exact, response/warcinfo skipped, invalid utf8 quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wet").toFile
    val plain = Warc.skippableRecord("warcinfo", date) ++
      Warc.responseRecord("https://w.example/resp", date, 200,
        "<html>not a conversion</html>".getBytes(UTF_8)) ++
      Warc.conversionRecord("https://w.example/1", date,
        "extracted text, already plain & unescaped".getBytes(UTF_8)) ++
      Warc.conversionRecord("https://w.example/2", date, Array[Byte]()) ++
      // invalid UTF-8 block: quarantined to null text, row kept
      Warc.conversionRecord("https://w.example/3", date,
        Array[Byte](0x61, 0xFF.toByte, 0xFE.toByte))
    val o1 = new FileOutputStream(new File(dir, "seg-00.warc.wet"))
    o1.write(plain); o1.close()
    // gz member-per-record, Common Crawl's *.warc.wet.gz naming
    val o2 = new FileOutputStream(new File(dir, "seg-01.warc.wet.gz"))
    val g = new GZIPOutputStream(o2)
    g.write(Warc.conversionRecord("https://w.example/4", date,
      "second segment".getBytes(UTF_8))); g.finish(); o2.close()
    // a plain .warc in the dir is NOT a WET segment
    val o3 = new FileOutputStream(new File(dir, "seg-02.warc"))
    o3.write(Warc.responseRecord("https://w.example/5", date, 200,
      "<p>x</p>".getBytes(UTF_8))); o3.close()

    val rows = Warc.readWet(spark, dir.getAbsolutePath).orderBy("url").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq(
      "https://w.example/1", "https://w.example/2",
      "https://w.example/3", "https://w.example/4"))
    val byUrl = rows.map(r => r.getString(0) -> r).toMap
    assert(byUrl("https://w.example/1").getString(3) ==
      "extracted text, already plain & unescaped")
    assert(byUrl("https://w.example/2").getString(3) == "") // empty block kept
    assert(byUrl("https://w.example/3").isNullAt(3))        // quarantined
    assert(byUrl("https://w.example/4").getString(3) == "second segment")
    assert(rows.forall(_.isNullAt(2)))                      // html always null
    assert(rows.forall(_.getString(4) == "und"))
    // and read() on the same dir sees only the .warc segment
    assert(Warc.read(spark, dir.getAbsolutePath).count() == 1L)
  }

  test("revisit records: parsed fields, digest-less skipped, responses carry the digest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-revisit").toFile
    val bytes =
      Warc.responseRecord("https://r.example/orig", date, 200,
        "<p>original</p>".getBytes(UTF_8), payloadDigest = Some("md5:abc123")) ++
      Warc.revisitRecord("https://r.example/again", "2026-02-02T00:00:00Z",
        "md5:abc123", refersToUri = "https://r.example/orig",
        refersToDate = date) ++
      // digest-less revisit: no join key -> skipped by policy
      ("WARC/1.1\r\nWARC-Type: revisit\r\nWARC-Date: " + date + "\r\n" +
        "WARC-Target-URI: https://r.example/nokey\r\n" +
        "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val o = new FileOutputStream(new File(dir, "seg-00.warc")); o.write(bytes); o.close()
    val resp = Warc.read(spark, dir.getAbsolutePath).collect()
    assert(resp.length == 1 &&
      resp.head.getAs[String]("payload_digest") == "md5:abc123")
    val rev = Warc.readRevisits(spark, dir.getAbsolutePath).collect()
    assert(rev.length == 1)
    val r = rev.head
    assert(r.getAs[String]("url") == "https://r.example/again")
    assert(r.getAs[String]("payload_digest") == "md5:abc123")
    assert(r.getAs[String]("refers_to_uri") == "https://r.example/orig")
    assert(r.getAs[String]("profile").endsWith("identical-payload-digest"))
    assert(r.getAs[java.sql.Timestamp]("refers_to_ts") != null)
  }

  test("resolveRevisits: hydrated content, unresolved surfaced, same-digest representative deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-revisit2").toFile
    val bytes =
      // TWO responses share a digest: the min-(url, ts) one must hydrate
      Warc.responseRecord("https://h.example/b", date, 200,
        "<p>copyB</p>".getBytes(UTF_8), payloadDigest = Some("md5:dup")) ++
      Warc.responseRecord("https://h.example/a", date, 200,
        "<p>copyA</p>".getBytes(UTF_8), payloadDigest = Some("md5:dup")) ++
      // a response WITHOUT a digest must never match anything
      Warc.responseRecord("https://h.example/nodigest", date, 200,
        "<p>plain</p>".getBytes(UTF_8)) ++
      Warc.revisitRecord("https://h.example/recrawl", "2026-03-03T00:00:00Z",
        "md5:dup") ++
      Warc.revisitRecord("https://h.example/lost", "2026-03-04T00:00:00Z",
        "md5:gone")
    val o = new FileOutputStream(new File(dir, "seg-00.warc")); o.write(bytes); o.close()
    val out = Warc.resolveRevisits(
      Warc.read(spark, dir.getAbsolutePath),
      Warc.readRevisits(spark, dir.getAbsolutePath)).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("text"), r.getAs[Boolean]("revisit"),
          r.getAs[Boolean]("resolved")))).toMap
    assert(out.size == 5)
    assert(out("https://h.example/a") == (("copyA", false, true)))
    assert(out("https://h.example/nodigest") == (("plain", false, true)))
    // hydrated from the min-url representative of the shared digest
    assert(out("https://h.example/recrawl") == (("copyA", true, true)))
    // unresolved pointer: kept, flagged, content null
    assert(out("https://h.example/lost") == ((null, true, false)))
  }
}
