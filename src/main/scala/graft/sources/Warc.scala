package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingestion — the container format Common Crawl
  * ships, so "Common-Crawl-style web pages" (input_hint) can be read
  * from their native files, not only from already-tabular parquet.
  * Reference analog: the recursive directory scan + whole-content
  * reader (Files.pm scan/read), here at WARC-record rather than
  * plain-file grain.
  *
  * Parses `response` records only (warcinfo/request/metadata records
  * are framing, not corpus): WARC headers give url
  * (WARC-Target-URI) and warc_ts (WARC-Date, ISO-8601); the record
  * block is an HTTP response whose status line is parsed and whose
  * entity body (after the first CRLFCRLF) becomes `html`. [[read]]
  * lands the result in the standard corpus schema with `text` =
  * [[graft.extract.TextExtract.extractText]] (the byte-identical
  * extraction invariant applies to WARC input unchanged).
  *
  * Scale shape: ONE TASK PER WARC FILE — exactly how Common Crawl is
  * processed in practice (segments are ~1 GB .warc.gz files; a 100 TB
  * crawl is ~10^5 files = 10^5 independent tasks, and a file is the
  * natural split unit because gzip members and WARC records don't
  * align to byte offsets). Records stream through a bounded-memory
  * iterator — one record's block in memory at a time, never the file.
  * Gzip input (.gz) is detected per file; Common Crawl's
  * member-per-record concatenated gzip reads transparently
  * (GZIPInputStream consumes concatenated members).
  *
  * Malformed framing (missing WARC/ magic, short block, bad
  * Content-Length) fails the file loudly — silent truncation of a
  * corrupt 1 GB segment would silently drop ~50k docs. Records of
  * other types and response blocks that are not HTTP messages are
  * skipped by POLICY (they're framing, not corpus loss); an empty
  * entity body after a valid header split is a real (kept) doc.
  */
object Warc {

  /** One parsed response record. `http_mime` is the HTTP
    * Content-Type's media type alone (lowercased, parameters like
    * `; charset=` stripped) — the routing key that sends text/html to
    * extraction and application/pdf or image subtypes to the
    * multimodal path; null when the response carries no Content-Type.
    */
  final case class WarcDoc(url: String, warc_ts: java.sql.Timestamp,
      html: Array[Byte], http_status: Int, http_mime: String,
      payload_digest: String)

  /** One parsed revisit record (WARC 1.1 §6.7.2 — the crawler ALREADY
    * deduplicated this fetch against a prior capture and stored only
    * the pointer): the revisited url/date plus the referred capture's
    * payload digest (the `identical-payload-digest` profile's join
    * key) and, when present, the referred URI/date. The block (bare
    * HTTP headers, no body) is framing — dropped.
    */
  final case class RevisitDoc(url: String, warc_ts: java.sql.Timestamp,
      profile: String, payload_digest: String,
      refers_to_uri: String, refers_to_ts: java.sql.Timestamp)

  /** One parsed conversion (WET) record — the block IS the extracted
    * text; `text` is null when the block is not valid UTF-8 (the
    * extractor's quarantine discipline: counted downstream, never
    * dropped here).
    */
  final case class WetDoc(url: String, warc_ts: java.sql.Timestamp,
      text: String)

  /** Corpus-schema DataFrame (url, warc_ts, html, text, lang) from
    * `path` (a file, directory, or glob of .warc / .warc.gz).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = listFiles(spark, path,
      n => n.endsWith(".warc") || n.endsWith(".warc.gz"))
    require(paths.nonEmpty, s"no .warc/.warc.gz files under $path")
    openTasks[WarcDoc](spark, paths, (in, p) => records(in, p))
      .toDF()
      .select(col("url"), col("warc_ts"), col("html"),
        graft.extract.TextExtract.extractText(col("html")).as("text"),
        lit("und").as("lang"), col("http_status"), col("http_mime"),
        col("payload_digest"))
  }

  /** Revisit records from `path` — the crawl-level dedup pointers CC
    * writes instead of re-storing an identical payload. Same
    * one-task-per-file / bounded-iterator / loud-framing contract as
    * [[read]].
    */
  def readRevisits(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = listFiles(spark, path,
      n => n.endsWith(".warc") || n.endsWith(".warc.gz"))
    require(paths.nonEmpty, s"no .warc/.warc.gz files under $path")
    openTasks[RevisitDoc](spark, paths,
      (in, p) => typedRecords(in, p, "revisit", parseRevisit)).toDF()
  }

  /** Hydrate revisit pointers against a response corpus: one output
    * row per response (revisit = false) PLUS one per revisit record
    * carrying the REFERRED capture's content under the revisit's own
    * url/warc_ts (revisit = true, resolved = whether the digest
    * matched a stored payload; unresolved rows keep null html/text —
    * surfaced, never dropped). This materializes "what the crawler
    * actually saw" from what it chose to store — the recrawl-aware
    * corpus view url-revisit dedup and freshness analyses need.
    *
    * Join discipline at 10^12 rows: responses collapse to ONE
    * deterministic representative per payload digest (map-side
    * min-struct by (url, warc_ts) — the KeepBest shape, no window
    * sort), so content shuffles ONCE keyed on the digest; the revisit
    * frame is pointer-width. Null digests (responses without the
    * header) never match — a null key drops out of the equi-join
    * rather than fabricating a cluster.
    */
  def resolveRevisits(responses: DataFrame, revisits: DataFrame): DataFrame = {
    val rep = responses
      .filter(col("payload_digest").isNotNull)
      .groupBy(col("payload_digest"))
      .agg(min(struct(col("url"), col("warc_ts"), col("html"), col("text"),
        col("lang"))).as("r"))
      .select(col("payload_digest"), col("r.html").as("_h"),
        col("r.text").as("_t"), col("r.lang").as("_l"))
    val base = responses.select(col("url"), col("warc_ts"), col("html"),
      col("text"), col("lang"), lit(false).as("revisit"),
      lit(true).as("resolved"))
    val hydrated = revisits
      .join(rep, Seq("payload_digest"), "left")
      .select(col("url"), col("warc_ts"), col("_h").as("html"),
        col("_t").as("text"), col("_l").as("lang"), lit(true).as("revisit"),
        col("_h").isNotNull.as("resolved"))
    base.unionByName(hydrated)
  }

  /** Corpus-schema DataFrame (url, warc_ts, html=null, text, lang)
    * from WET files (`.wet` / `.wet.gz`, including Common Crawl's
    * `*.warc.wet.gz` naming) — the pre-extracted-text sibling of the
    * response container: `conversion` records whose block is the page
    * text itself (no HTTP message, no markup). Same one-task-per-file
    * grain, bounded-memory iterator, and loud-framing-failure
    * contract as [[read]]; `html` is null (there is none), invalid
    * UTF-8 blocks yield null `text` (quarantine, counted not
    * dropped), an empty block is a real empty doc.
    */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = listFiles(spark, path,
      n => n.endsWith(".wet") || n.endsWith(".wet.gz"))
    require(paths.nonEmpty, s"no .wet/.wet.gz files under $path")
    openTasks[WetDoc](spark, paths,
        (in, p) => typedRecords(in, p, "conversion", parseConversion))
      .toDF()
      .select(col("url"), col("warc_ts"),
        lit(null).cast("binary").as("html"), col("text"),
        lit("und").as("lang"))
  }

  /** One task per file over `paths`: open (gzip-sniffed by name),
    * stream `mk`'s records, and close on task completion. EOF closes
    * each stream inline (records()), but a consumer that stops early
    * (limit/take) or a loud parse failure leaves the task's current
    * stream open — on a long-lived executor those leaked
    * FSDataInputStreams exhaust descriptors/datanode connections. The
    * task-completion hook closes whatever is still open (close after
    * EOF-close is a harmless no-op).
    */
  private def openTasks[T](spark: SparkSession, paths: Seq[String],
      mk: (DataInputStream, String) => Iterator[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): org.apache.spark.sql.Dataset[T] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.createDataset(paths)
      .repartition(paths.size)
      .mapPartitions { it =>
        val opened = new java.util.ArrayList[InputStream]()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            opened.forEach(s => try s.close() catch { case _: Exception => () })
          })
        it.flatMap { p =>
          val fs = new Path(p).getFileSystem(conf.value)
          val fileLen = fs.getFileStatus(new Path(p)).getLen
          val raw: InputStream = fs.open(new Path(p))
          // register raw FIRST: a corrupt/empty .gz makes the
          // GZIPInputStream CONSTRUCTOR throw (it reads the header),
          // and the wrapper that would own raw never exists — without
          // this, task retries leak one descriptor per attempt
          opened.add(raw)
          var counted = 0L
          val counting = new java.io.FilterInputStream(raw) {
            override def read(): Int =
              { val b = super.read(); if (b >= 0) counted += 1; b }
            override def read(b: Array[Byte], off: Int, len: Int): Int =
              { val n = super.read(b, off, len); if (n > 0) counted += n; n }
          }
          val gz = if (p.endsWith(".gz")) new CheckedGzip(counting) else null
          val in: InputStream = if (gz != null) gz else new BufferedInputStream(counting)
          opened.add(in)
          val base = mk(new DataInputStream(in), p)
          if (gz == null) base
          else base ++ {
            // GZIPInputStream treats an unparseable next-member header
            // as clean end-of-stream (readTrailer swallows the
            // IOException), so a corrupted member boundary mid-file
            // would silently drop every later record — the exact
            // silent-truncation failure this module's contract rules
            // out. At a CLEAN logical EOF the raw stream is fully
            // drained and the inflater holds exactly the last 8-byte
            // trailer; unread raw bytes OR extra inflater leftover
            // mean bytes after the last readable member that no
            // member parse consumed — corruption, loudly.
            // KNOWN RESIDUAL WINDOW (documented, not covered): a file
            // truncated strictly INSIDE a valid next-member header
            // (magic intact, then EOF) whose partial-header bytes the
            // trailer probe pulled through this counting stream reads
            // as clean EOF — the probe consumes them (counted reaches
            // fileLen) and getRemaining stays 8. That is a <= ~10-byte
            // tail window (up to ~26 with optional header fields);
            // closing it needs a from-scratch member walk (own header
            // parser + raw Inflater), which JDK GZIPInputStream's
            // probe-and-swallow design cannot express from outside.
            val unparsed = (fileLen - counted) + math.max(0L, gz.leftover - 8L)
            if (unparsed > 0) throw new java.io.IOException(
              s"$p: corrupt gzip member boundary - $unparsed " +
                "bytes unconsumed after the last readable member")
            Iterator.empty
          }
        }
      }
  }

  /** GZIPInputStream with the inflater's leftover-byte count exposed:
    * at logical EOF this is the byte mass sitting in the read-ahead
    * buffer beyond the decompressed stream — exactly 8 (the member
    * trailer) for a cleanly-terminated file, more when an unparseable
    * next member made readTrailer declare a false EOF.
    */
  private class CheckedGzip(in: InputStream) extends GZIPInputStream(in) {
    // records() closes the stream at EOF before the caller's boundary
    // check runs, and Inflater.end() zeroes getRemaining — so the
    // count is captured at close time, not read lazily
    @volatile private var saved = -1L
    override def close(): Unit = {
      if (saved < 0) saved = inf.getRemaining.toLong
      super.close()
    }
    def leftover: Long = if (saved >= 0) saved else inf.getRemaining.toLong
  }

  private def listFiles(spark: SparkSession, path: String,
      want: String => Boolean): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val roots =
      if (fs.isDirectory(p)) Option(fs.globStatus(new Path(p, "*"))).toSeq.flatten
      else Option(fs.globStatus(p)).toSeq.flatten
    roots.map(_.getPath.toString).filter(want).sorted
  }

  /** Lazily parse one stream's records; closes `in` at EOF and on any
    * parse failure (the loud IOException must not also leak the
    * stream — callers additionally hold a task-completion close for
    * the stopped-early consumer case).
    */
  private[sources] def records(in: DataInputStream,
      name: String): Iterator[WarcDoc] =
    typedRecords(in, name, "response", parseResponse(_, _, name))

  private[sources] def typedRecords[T >: Null <: AnyRef](in: DataInputStream,
      name: String, wantType: String,
      parse: (Map[String, String], Array[Byte]) => Option[T]): Iterator[T] =
      new Iterator[T] {
    private var nextDoc: T = null
    private var done = false

    private def advance(): Unit = try {
      while (nextDoc == null && !done) {
        val version = readLine(in)
        if (version == null) { done = true; in.close() }
        else if (version.isEmpty) () // inter-record padding
        else if (!version.startsWith("WARC/"))
          throw new java.io.IOException(
            s"$name: expected WARC/ record header, got '${version.take(40)}'")
        else {
          val headers = readHeaders(in, name)
          val len = headers.getOrElse("content-length",
            throw new java.io.IOException(s"$name: record missing Content-Length"))
            .toLong
          if (len > Int.MaxValue - 8)
            throw new java.io.IOException(s"$name: record block too large: $len")
          val block = new Array[Byte](len.toInt)
          try in.readFully(block) catch {
            case _: EOFException =>
              throw new java.io.IOException(s"$name: truncated record block")
          }
          if (headers.get("warc-type").contains(wantType))
            parse(headers, block).foreach(nextDoc = _)
        }
      }
    } catch {
      case e: Throwable =>
        done = true
        try in.close() catch { case _: Exception => () }
        throw e
    }

    override def hasNext: Boolean = { advance(); nextDoc != null }
    override def next(): T = {
      advance()
      if (nextDoc == null) throw new NoSuchElementException
      val d = nextDoc; nextDoc = null; d
    }
  }

  /** Conversion (WET) block → WetDoc; the block is the text itself.
    * Strict UTF-8 decode — malformed bytes yield null `text`
    * (quarantine), never a replacement-char mutation.
    */
  private def parseConversion(h: Map[String, String],
      block: Array[Byte]): Option[WetDoc] = {
    val url = h.getOrElse("warc-target-uri", return None)
    val ts = h.get("warc-date").map(d =>
      java.sql.Timestamp.from(java.time.Instant.parse(d)))
      .getOrElse(return None)
    val text =
      try UTF_8.newDecoder().decode(java.nio.ByteBuffer.wrap(block)).toString
      catch { case _: java.nio.charset.CharacterCodingException => null }
    Some(WetDoc(url, ts, text))
  }

  /** WARC named-field block: lines until the blank separator. */
  private def readHeaders(in: DataInputStream,
      name: String): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0) b += (line.substring(0, i).trim.toLowerCase ->
        line.substring(i + 1).trim)
      line = readLine(in)
    }
    if (line == null)
      throw new java.io.IOException(s"$name: truncated record headers")
    b.result()
  }

  /** HTTP-response block → WarcDoc; None when the block has no HTTP
    * status line or no entity body (a bodiless redirect/304 is
    * framing, not corpus).
    */
  private def parseResponse(h: Map[String, String], block: Array[Byte],
      name: String): Option[WarcDoc] = {
    val url = h.getOrElse("warc-target-uri", return None)
    val ts = h.get("warc-date").map(d =>
      java.sql.Timestamp.from(java.time.Instant.parse(d)))
      .getOrElse(return None)
    val sep = indexOfCrlfCrlf(block)
    if (sep < 0) return None
    val head = new String(block, 0, sep, ISO_8859_1)
    val statusLine = head.takeWhile(c => c != '\r' && c != '\n')
    if (!statusLine.startsWith("HTTP/")) return None
    val status = statusLine.split(" ", 3) match {
      case Array(_, code, _*) if code.forall(_.isDigit) && code.length == 3 =>
        code.toInt
      case _ => return None
    }
    val body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    // media type only: parameters (charset, boundary) are transport
    // detail, and real-crawl casing/spacing varies freely
    val mime = MimePattern.findFirstMatchIn(head)
      .map(_.group(1).trim.toLowerCase).filter(_.nonEmpty).orNull
    Some(WarcDoc(url, ts, body, status, mime,
      h.get("warc-payload-digest").orNull))
  }

  /** Revisit record → RevisitDoc; None without a target URI, date, or
    * payload digest (a digest-less revisit has no join key — framing
    * noise, not corpus).
    */
  private def parseRevisit(h: Map[String, String],
      block: Array[Byte]): Option[RevisitDoc] = {
    val url = h.getOrElse("warc-target-uri", return None)
    val ts = h.get("warc-date").map(d =>
      java.sql.Timestamp.from(java.time.Instant.parse(d)))
      .getOrElse(return None)
    val digest = h.getOrElse("warc-payload-digest", return None)
    Some(RevisitDoc(url, ts, h.get("warc-profile").orNull, digest,
      h.get("warc-refers-to-target-uri").orNull,
      h.get("warc-refers-to-date").map(d =>
        java.sql.Timestamp.from(java.time.Instant.parse(d))).orNull))
  }

  private val MimePattern =
    "(?im)^content-type\\s*:\\s*([^;\\r\\n]*)".r

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** One CRLF- (or LF-)terminated header line as ISO-8859-1 (WARC
    * named fields are octets; UTF-8 urls survive the round trip
    * because body bytes never pass through here). null at EOF.
    */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') buf.write(c)
      c = in.read()
    }
    new String(buf.toByteArray, ISO_8859_1)
  }

  // ---- fixture building (tests + the q_warc oracle query): a
  // correct, minimal WARC writer — also the documented shape the
  // parser accepts.

  /** Serialize one response record (version 1.0, CRLF framing).
    * `contentType = None` omits the Content-Type header entirely.
    */
  def responseRecord(url: String, isoDate: String, status: Int,
      body: Array[Byte], extraHttpHeaders: String = "",
      contentType: Option[String] = Some("text/html; charset=utf-8"),
      payloadDigest: Option[String] = None): Array[Byte] = {
    val http = (s"HTTP/1.1 $status OK\r\n" +
      contentType.map(ct => s"Content-Type: $ct\r\n").getOrElse("") +
      extraHttpHeaders +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1)
    val block = http ++ body
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:${java.util.UUID.nameUUIDFromBytes(url.getBytes(UTF_8))}>\r\n" +
      s"WARC-Date: $isoDate\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      payloadDigest.map(d => s"WARC-Payload-Digest: $d\r\n").getOrElse("") +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(ISO_8859_1)
    head ++ block ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  /** Serialize one revisit record (identical-payload-digest profile):
    * the block is the bare HTTP header section, as crawlers write it.
    */
  def revisitRecord(url: String, isoDate: String, payloadDigest: String,
      refersToUri: String = null, refersToDate: String = null): Array[Byte] = {
    val block = "HTTP/1.1 200 OK\r\n\r\n".getBytes(ISO_8859_1)
    val head = ("WARC/1.1\r\n" +
      "WARC-Type: revisit\r\n" +
      s"WARC-Record-ID: <urn:uuid:${java.util.UUID.nameUUIDFromBytes((url + "#revisit").getBytes(UTF_8))}>\r\n" +
      s"WARC-Date: $isoDate\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/identical-payload-digest\r\n" +
      s"WARC-Payload-Digest: $payloadDigest\r\n" +
      Option(refersToUri).map(u => s"WARC-Refers-To-Target-URI: $u\r\n").getOrElse("") +
      Option(refersToDate).map(d => s"WARC-Refers-To-Date: $d\r\n").getOrElse("") +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(ISO_8859_1)
    head ++ block ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  /** Serialize one WET conversion record (block = the text bytes). */
  def conversionRecord(url: String, isoDate: String,
      text: Array[Byte]): Array[Byte] =
    ("WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      s"WARC-Record-ID: <urn:uuid:${java.util.UUID.nameUUIDFromBytes(url.getBytes(UTF_8))}>\r\n" +
      s"WARC-Date: $isoDate\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${text.length}\r\n\r\n").getBytes(ISO_8859_1) ++
      text ++ "\r\n\r\n".getBytes(ISO_8859_1)

  /** Serialize a non-response record the reader must skip. */
  def skippableRecord(warcType: String, isoDate: String): Array[Byte] = {
    val block = "irrelevant\r\n".getBytes(ISO_8859_1)
    (s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Date: $isoDate\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(ISO_8859_1) ++
      block ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }
}
