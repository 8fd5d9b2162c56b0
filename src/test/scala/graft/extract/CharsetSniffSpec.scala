package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** HTML5 charset sniffing precedence, alias table, total decode. */
class CharsetSniffSpec extends AnyFunSuite {
  import CharsetSniff._

  test("label normalization maps WHATWG aliases") {
    assert(normalize("UTF8") == "utf-8")
    assert(normalize("Latin-1") == "iso-8859-1")
    assert(normalize("SJIS") == "shift_jis")
    assert(normalize("cp1252") == "windows-1252")
    assert(normalize("\"utf-8\"") == "utf-8")
    assert(normalize("  ") == null)
    assert(normalize(null) == null)
  }

  test("precedence: BOM > Content-Type param > meta prescan > fallback") {
    val meta = "<meta charset=shift_jis><p>x".getBytes("US-ASCII")
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ meta
    assert(sniff("text/html; charset=ISO-8859-1", bom) == "utf-8") // BOM wins
    assert(sniff("text/html; charset=ISO-8859-1", meta) == "iso-8859-1") // header beats meta
    assert(sniff("text/html", meta) == "shift_jis") // meta short form
    val equivForm = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=EUC-JP\">").getBytes("US-ASCII")
    assert(sniff(null, equivForm) == "euc-jp")
    assert(sniff("text/html", "<p>plain</p>".getBytes) == null)
  }

  test("meta prescan stops at the window: late declarations are invisible") {
    val late = (" " * 1100 + "<meta charset=shift_jis>").getBytes("US-ASCII")
    assert(metaPrescan(late) == null)
    assert(metaPrescan(late, prescanBytes = 2048) == "shift_jis")
  }

  test("decode: BOM stripped, UTF-16LE real, unsupported label falls back, damage -> U+FFFD") {
    val t = "héllo wörld"
    val (c16, s16) = decode(null,
      Array(0xff.toByte, 0xfe.toByte) ++ t.getBytes("UTF-16LE"))
    assert(c16 == "utf-16le" && s16 == t)
    // declared charset the JVM has no codec for -> utf-8 fallback
    val (cf, sf) = decode("text/html; charset=x-user-defined", "abc".getBytes)
    assert(cf == "utf-8" && sf == "abc")
    // cp1252 bytes fed with NO declaration: total decode, U+FFFD scars
    val raw = "café".getBytes("windows-1252")
    val (cd, sd) = decode(null, raw)
    assert(cd == "utf-8" && sd == "caf�")
    assert(decode(null, null) == ((null, null)))
  }

  test("decode honors an explicit non-utf8 fallback (HTML5 field default)") {
    val raw = "café €".getBytes("windows-1252")
    val (c, s) = decode(null, raw, fallback = "windows-1252")
    assert(c == "windows-1252" && s == "café €")
  }
}
