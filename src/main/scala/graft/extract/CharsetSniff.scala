package graft.extract

import java.nio.charset.{Charset, CodingErrorAction}

/** HTML charset detection + total decode — the ingestion-repair stage
  * between raw WARC body bytes and the UTF-8 text invariant. A large
  * fraction of real web HTML is not UTF-8 (windows-1252, shift_jis,
  * gb2312, ...); feeding those bytes to the strict-UTF-8 extractor
  * quarantines whole documents that a charset-aware decode recovers.
  *
  * Detection is the HTML5 encoding-sniffing precedence
  * (WHATWG Encoding / HTML §13.2.3.2):
  *   1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — always wins;
  *   2. the transport layer: `charset=` parameter of the HTTP
  *      Content-Type header;
  *   3. a bounded META PRESCAN of the first `prescanBytes` bytes
  *      (default 1024, the spec's figure): the first
  *      `<meta ... charset=X>` match, covering both the HTML5 short
  *      form and the legacy `http-equiv` form;
  *   4. none → the caller's fallback (this engine defaults to UTF-8 —
  *      the corpus contract — not HTML5's legacy windows-1252;
  *      pipelines wanting field behavior pass it explicitly).
  *
  * Decode is TOTAL: malformed input and unmappable sequences become
  * U+FFFD (the web-pipeline norm — a mojibake'd document is still
  * dedupable and filterable; a dropped one is not), an unsupported or
  * alias-unknown label falls back like case 4, and the effective
  * charset actually used is surfaced next to the text so no repair is
  * silent. Everything is per-row byte arithmetic — map-side only, no
  * shuffle, safe to fuse into the WARC scan at 10^12 docs.
  */
object CharsetSniff {

  /** Charset-label normalization (WHATWG Encoding's label table,
    * the subset that shows up in web corpora).
    */
  def normalize(label: String): String = {
    if (label == null) return null
    val l = label.trim.toLowerCase.stripPrefix("\"").stripSuffix("\"")
    l match {
      case "" => null
      case "utf8" | "unicode-1-1-utf-8" => "utf-8"
      case "latin1" | "latin-1" | "l1" | "iso8859-1" | "iso_8859-1" |
          "iso-ir-100" | "8859-1" => "iso-8859-1"
      case "shift-jis" | "sjis" | "shiftjis" | "ms_kanji" | "x-sjis" => "shift_jis"
      case "cp1252" | "windows1252" | "x-cp1252" | "win-1252" => "windows-1252"
      case "euc_jp" => "euc-jp"
      case "gb_2312" | "gb_2312-80" | "csgb2312" => "gb2312"
      case other => other
    }
  }

  /** BOM charset of the body, or null. */
  def bomCharset(body: Array[Byte]): String = {
    if (body == null) null
    else if (body.length >= 3 && body(0) == 0xef.toByte && body(1) == 0xbb.toByte &&
      body(2) == 0xbf.toByte) "utf-8"
    else if (body.length >= 2 && body(0) == 0xff.toByte && body(1) == 0xfe.toByte) "utf-16le"
    else if (body.length >= 2 && body(0) == 0xfe.toByte && body(1) == 0xff.toByte) "utf-16be"
    else null
  }

  private val CtCharsetRe =
    """(?i);\s*charset\s*=\s*("[^"]+"|'[^']+'|[^\s;]+)""".r

  /** charset parameter of a Content-Type header value, or null. */
  def fromContentType(contentType: String): String =
    if (contentType == null) null
    else CtCharsetRe.findFirstMatchIn(contentType)
      .map(m => normalize(m.group(1).stripPrefix("'").stripSuffix("'"))).orNull

  private val MetaCharsetRe =
    """(?i)<meta[^>]*charset\s*=\s*["']?([a-z0-9._:-]+)""".r

  /** First `<meta ... charset=X>` in the prescan window (decoded as
    * ISO-8859-1 — a byte-transparent superset, so the ASCII-range
    * markup the regex matches survives any source encoding).
    */
  def metaPrescan(body: Array[Byte], prescanBytes: Int = 1024): String = {
    if (body == null || body.isEmpty) return null
    val n = math.min(body.length, prescanBytes)
    val head = new String(body, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
    MetaCharsetRe.findFirstMatchIn(head).map(m => normalize(m.group(1))).orNull
  }

  /** Detected charset label by HTML5 precedence, or null. */
  def sniff(contentType: String, body: Array[Byte],
      prescanBytes: Int = 1024): String = {
    val bom = bomCharset(body)
    if (bom != null) bom
    else {
      val ct = fromContentType(contentType)
      if (ct != null) ct else metaPrescan(body, prescanBytes)
    }
  }

  private def charsetFor(label: String): Option[Charset] =
    try Option(label).filter(Charset.isSupported).map(Charset.forName)
    catch { case _: java.nio.charset.IllegalCharsetNameException => None }

  /** (effective charset, decoded text). The sniffed charset decodes
    * the body (BOM bytes stripped first — they are signaling, not
    * content); unsniffable or JVM-unsupported labels use `fallback`.
    * Total: malformed/unmappable → U+FFFD.
    */
  def decode(contentType: String, body: Array[Byte],
      fallback: String = "utf-8", prescanBytes: Int = 1024): (String, String) = {
    if (body == null) return (null, null)
    val sniffed = sniff(contentType, body, prescanBytes)
    val (label, cs) = charsetFor(sniffed) match {
      case Some(c) => (sniffed, c)
      case None => (fallback, Charset.forName(fallback))
    }
    val bomLen = bomCharset(body) match {
      case "utf-8" => 3
      case "utf-16le" | "utf-16be" => 2
      case _ => 0
    }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val text = dec.decode(
      java.nio.ByteBuffer.wrap(body, bomLen, body.length - bomLen)).toString
    (label, text)
  }
}
