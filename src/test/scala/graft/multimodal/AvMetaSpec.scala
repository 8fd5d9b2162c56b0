package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AV container header parsing: each parser checked against the
  * published byte layout via the deterministic fixture builders,
  * plus truncation / junk / routing behavior (fixtures are honest
  * containers — the parsers never see their builder's internals).
  */
class AvMetaSpec extends SparkSpec {

  test("wav: fmt + data chunk walk gives exact format facts and duration") {
    val p = AvMeta.wavBytes(rate = 16000, channels = 2, bits = 16, nSamples = 8000)
    val av = AvMeta.parseAvMeta(p).get
    assert(av.container == "wav" && av.kind == "audio")
    assert(av.sample_rate == 16000 && av.channels == 2 && av.bits_per_sample == 16)
    assert(av.brand == "pcm" && av.tracks == 1)
    // 8000 samples at 16 kHz = exactly 500 ms, independent of width
    assert(av.duration_ms == 500L)
  }

  test("wav: odd-sized chunk padding and unknown chunks are walked over") {
    // hand-build RIFF with an unknown 3-byte chunk (padded to 4) before fmt
    val base = AvMeta.wavBytes(8000, 1, 8, 1000)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12) // RIFF..WAVE
    out.write("junk".getBytes); out.write(Array[Byte](3, 0, 0, 0)) // le32 size 3
    out.write(Array[Byte](1, 2, 3, 0)) // 3 data bytes + pad
    out.write(base, 12, base.length - 12) // the real fmt + data chunks
    val av = AvMeta.parseAvMeta(out.toByteArray).get
    assert(av.sample_rate == 8000 && av.duration_ms == 125L) // 1000/8000 s
  }

  test("wav: truncated payload (no data chunk) keeps format, duration -1") {
    val p = AvMeta.wavBytes(44100, 1, 16, 100).take(36) // header + fmt only
    val av = AvMeta.parseAvMeta(p).get
    assert(av.sample_rate == 44100 && av.duration_ms == -1L)
  }

  test("mp4: truncated before moov keeps the identified container, duration -1") {
    // mdat-before-moov cut mid-payload (the common non-faststart crawl
    // truncation): ftyp + an mdat whose declared size overruns the
    // payload — identified container, partial facts, never None (None
    // would route to the unknown-magic stub and fabricate dimensions)
    val out = new java.io.ByteArrayOutputStream()
    def b32(v: Long): Unit = (3 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    b32(16L); out.write("ftyp".getBytes); out.write("isom".getBytes); b32(0L)
    b32(1000000L); out.write("mdat".getBytes); out.write(new Array[Byte](64)) // size lies
    val av = AvMeta.parseAvMeta(out.toByteArray).get
    assert(av.container == "mp4" && av.brand == "isom")
    assert(av.duration_ms == -1L && av.tracks == 0) // honest partials, no fakes
  }

  test("ogg: a literal 'OggS' inside packet bytes is not read as a page header") {
    // granule 2000 at 8000 Hz -> 250 ms; the payload string rides in a
    // fake packet region after the real pages and must be ignored
    // (version byte and header-type flags fail RFC 3533 validation)
    val real = AvMeta.oggVorbisBytes(8000, 1, 2000L)
    val junk = "comment mentioning OggS\u00ff\u00ff payload".getBytes("ISO-8859-1")
    val av = AvMeta.parseAvMeta(real ++ junk).get
    assert(av.duration_ms == 2000L * 1000 / 8000)
  }

  test("mp4: ftyp brand, mvhd v0 duration, trak count") {
    val p = AvMeta.mp4Bytes("mp42", timescale = 600, durationTicks = 7207L, tracks = 3)
    val av = AvMeta.parseAvMeta(p).get
    assert(av.container == "mp4" && av.kind == "video")
    assert(av.brand == "mp42" && av.tracks == 3)
    assert(av.duration_ms == 7207L * 1000 / 600) // floor: 12011
    assert(av.sample_rate == -1 && av.channels == -1) // never fabricated
  }

  test("mp4: version-1 mvhd (64-bit duration) parses") {
    // rebuild the moov with a v1 mvhd: 120-byte box, be64 times
    val out = new java.io.ByteArrayOutputStream()
    def b32(v: Long): Unit = (3 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def b64(v: Long): Unit = (7 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    b32(16L); out.write("ftyp".getBytes); out.write("isom".getBytes); b32(0L)
    b32(8L + 120L); out.write("moov".getBytes)
    b32(120L); out.write("mvhd".getBytes)
    out.write(Array[Byte](1, 0, 0, 0)) // version 1
    b64(0L); b64(0L) // creation/modification (64-bit in v1)
    b32(1000L) // timescale
    b64(5000000001L) // duration ticks > Int.MaxValue
    out.write(new Array[Byte](120 - 8 - 4 - 16 - 4 - 8))
    val av = AvMeta.parseAvMeta(out.toByteArray).get
    assert(av.duration_ms == 5000000001L) // ticks·1000/1000 exactly, as a Long
  }

  test("mp3: MPEG-1 Layer III header facts and CBR duration estimate") {
    val p = AvMeta.mp3Bytes(bitrateIdx = 9, nFrames = 38, mono = false) // 128 kbps
    val av = AvMeta.parseAvMeta(p).get
    assert(av.container == "mp3" && av.kind == "audio")
    assert(av.sample_rate == 44100 && av.channels == 2 && av.brand == "mpeg1-layer3")
    val frameLen = 144 * 128 * 1000 / 44100 // 417
    assert(p.length == 38 * frameLen)
    assert(av.duration_ms == p.length.toLong * 8 / 128)
    assert(AvMeta.parseAvMeta(AvMeta.mp3Bytes(9, 38, mono = true)).get.channels == 1)
  }

  test("mp3: free/bad bitrate, reserved version/layer, junk all refuse") {
    def hdr(b1: Int, b2: Int): Array[Byte] =
      Array(0xff.toByte, b1.toByte, b2.toByte, 0.toByte) ++ new Array[Byte](100)
    assert(AvMeta.parseAvMeta(hdr(0xfb, 0x00)).isEmpty) // bitrate idx 0 (free)
    assert(AvMeta.parseAvMeta(hdr(0xfb, 0xf0)).isEmpty) // bitrate idx 15 (bad)
    assert(AvMeta.parseAvMeta(hdr(0xfb, 0x9c)).isEmpty) // sample-rate idx 3 (reserved)
    assert(AvMeta.parseAvMeta(hdr(0xf3, 0x90)).isEmpty) // MPEG-2: out of scope
    assert(AvMeta.parseAvMeta(hdr(0xff, 0x90)).isEmpty) // layer reserved
    assert(AvMeta.parseAvMeta("definitely not audio/video".getBytes).isEmpty)
    assert(AvMeta.parseAvMeta(Media.pngBytes(8, 8)).isEmpty) // images aren't AV
    assert(AvMeta.parseAvMeta(null).isEmpty)
    assert(AvMeta.parseAvMeta(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("mp3: ID3v2 prefix skipped — same facts, CBR duration over audio bytes only") {
    val audio = AvMeta.mp3Bytes(bitrateIdx = 9, nFrames = 38, mono = false)
    val tagged = AvMeta.id3v2Bytes(1000) ++ audio
    assert(AvMeta.parseAvMeta(tagged).get == AvMeta.parseAvMeta(audio).get)
    // tag-only payload (no frame after the tag) refuses
    assert(AvMeta.parseAvMeta(AvMeta.id3v2Bytes(64)).isEmpty)
  }

  test("ogg: vorbis ident facts + eos-granule duration; truncation degrades honestly") {
    val p = AvMeta.oggVorbisBytes(rate = 44100, channels = 2, granule = 441000L)
    val av = AvMeta.parseAvMeta(p).get
    assert(av.container == "ogg" && av.kind == "audio" && av.brand == "vorbis")
    assert(av.sample_rate == 44100 && av.channels == 2)
    assert(av.duration_ms == 10000L) // 441000 samples at 44.1 kHz
    // cut before the eos page: ident facts survive, duration unknown (-1)
    val cut = AvMeta.parseAvMeta(p.take(27 + 1 + 30)).get
    assert(cut.sample_rate == 44100 && cut.duration_ms == -1L)
  }

  test("ogg: opus 48 kHz granule clock, theora and unknown codecs brand-sniffed") {
    def page(packet: Array[Byte], granule: Long, headerType: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("OggS".getBytes); out.write(0); out.write(headerType)
      (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xff).toInt))
      (0 until 12).foreach(_ => out.write(0)) // serial/seq/crc
      out.write(1); out.write(packet.length); out.write(packet)
      out.toByteArray
    }
    val opusHead = "OpusHead".getBytes ++ Array[Byte](1, 2, 0, 0) ++
      Array[Byte](0x80.toByte, 0xbb.toByte, 0, 0) ++ Array[Byte](0, 0, 0) // 48000 le32
    val opus = page(opusHead, 0L, 2) ++ page(Array[Byte](0), 96000L, 4)
    val avO = AvMeta.parseAvMeta(opus).get
    assert(avO.brand == "opus" && avO.channels == 2 && avO.sample_rate == 48000)
    assert(avO.duration_ms == 2000L) // granules are 48 kHz regardless of input rate
    val theora = page(Array[Byte](0x80.toByte) ++ "theora".getBytes ++ new Array[Byte](20), 0L, 2)
    val avT = AvMeta.parseAvMeta(theora).get
    assert(avT.brand == "theora" && avT.kind == "video")
    val other = page("BBCD????".getBytes, 0L, 2)
    assert(AvMeta.parseAvMeta(other).get.brand == "unknown")
  }

  test("Media.decode tier 2½: AV payloads get container kind + honest -1s, junk still stubs") {
    import spark.implicits._
    val rows = Seq(
      Media.MediaRow("w", "blob", AvMeta.wavBytes(8000, 1, 8, 800)),
      Media.MediaRow("v", "blob", AvMeta.mp4Bytes("isom", 1000, 2500L, 2)),
      Media.MediaRow("a", "blob", AvMeta.mp3Bytes(3, 5, mono = true)),
      Media.MediaRow("j", "blob", "no codec claims this".getBytes)).toDS()
    val dec = Media.decode(spark, rows).collect().map(d => d.media_id -> d).toMap
    assert(dec("w").kind == "wav" && dec("v").kind == "mp4" && dec("a").kind == "mp3")
    Seq("w", "v", "a").foreach { id =>
      assert(dec(id).width == -1 && dec(id).height == -1 && dec(id).n_frames == -1)
      assert(dec(id).red_mean == -1)
    }
    assert(dec("j").kind == "blob" && dec("j").width > 0) // stub tier unchanged
  }

  test("pcmSamples: 8-bit round trip, truncation clamp, non-PCM refusal") {
    val samples = Array(-128, -1, 0, 1, 127, 64, -64)
    val p = AvMeta.wavPcm8Bytes(8000, samples)
    assert(AvMeta.pcmSamples(p).get.toSeq == samples.toSeq)
    // truncated data chunk: the prefix decodes, no exception
    assert(AvMeta.pcmSamples(p.dropRight(3)).get.toSeq == samples.take(4).toSeq)
    // 16-bit silence (wavBytes writes zero PCM): zeros at half the byte count
    val p16 = AvMeta.wavBytes(8000, 1, 16, 50)
    assert(AvMeta.pcmSamples(p16).get.toSeq == Seq.fill(50)(0))
    // non-PCM format tag: header facts still parse, samples refuse
    val nonPcm = AvMeta.wavPcm8Bytes(8000, samples).clone()
    nonPcm(20) = 2 // fmt tag at RIFF(12) + id(4) + size(4)
    assert(AvMeta.pcmSamples(nonPcm).isEmpty)
    assert(AvMeta.parseAvMeta(nonPcm).get.brand == "fmt2")
  }

  test("audioFacts: closed-form energies, zero crossings, fingerprint bits") {
    // 65 windows x 4 samples, amplitudes 1,2,3,4 cycling: E strictly
    // rises within each cycle, drops 4->1 at cycle starts
    val amps = (0 until 65).map(k => (k % 4) + 1)
    val s = amps.flatMap(a => Seq.fill(4)(a)).toArray
    val f = AvMeta.audioFacts(AvMeta.wavPcm8Bytes(8000, s)).get
    assert(f.n_samples == 260)
    assert(f.total_energy == 4L * amps.map(a => a * a).sum)
    assert(f.zero_crossings == 0) // all positive
    (0 until 64).foreach { k =>
      val expect = amps(k + 1) * amps(k + 1) > amps(k) * amps(k)
      assert(((f.fp >> k) & 1L) == (if (expect) 1L else 0L), s"bit $k")
    }
    // amplitude scaling preserves every strict comparison -> same fp
    val f2 = AvMeta.audioFacts(AvMeta.wavPcm8Bytes(8000, s.map(_ * 2))).get
    assert(f2.fp == f.fp && f2.total_energy == 4 * f.total_energy)
    // sign alternation: crossings counted at strict sign flips only
    val alt = AvMeta.audioFacts(AvMeta.wavPcm8Bytes(8000,
      (0 until 65).flatMap(k => Seq.fill(4)(if (k % 2 == 0) 3 else -3)).toArray)).get
    assert(alt.zero_crossings == 64)
    // too short to fingerprint
    assert(AvMeta.audioFacts(AvMeta.wavPcm8Bytes(8000, Array.fill(64)(1))).isEmpty)
  }

  test("audio near-dup: fingerprints feed the shared Hamming prober end-to-end") {
    import spark.implicits._
    val base = (0 until 65).map(k => (k % 4) + 1)
    def pcm(amps: Seq[Int]) =
      AvMeta.wavPcm8Bytes(8000, amps.flatMap(a => Seq.fill(4)(a)).toArray)
    val near = base.updated(64, 7) // only comparison 63 can flip: Hamming <= 1
    val far = (0 until 65).map(k => 4 - (k % 4)) // inverted pattern
    val rows = Seq(
      Media.MediaRow("a", "audio", pcm(base)),
      Media.MediaRow("b", "audio", pcm(near)),
      Media.MediaRow("c", "audio", pcm(far)),
      Media.MediaRow("j", "blob", "not audio".getBytes)).toDS()
    val fp = AvMeta.audioHashes(spark, rows)
    assert(fp.filter(col("id") === "j").head().isNullAt(1)) // no byte-noise hash
    val edges = graft.near.SimHash.edgesFromFingerprints(fp, graft.near.SimHash.Config())
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(edges.exists(e => Set(e._1, e._2) == Set("a", "b") && e._3 <= 1))
    assert(!edges.exists(e => Set(e._1, e._2).contains("c")))
  }

  test("AvMeta.parse operator: typed rows, unknown-magic rows dropped (audit grain)") {
    import spark.implicits._
    val rows = Seq(
      Media.MediaRow("w", "blob", AvMeta.wavBytes(32000, 2, 16, 16000)),
      Media.MediaRow("x", "blob", Array[Byte](9, 9, 9, 9))).toDS()
    val out = AvMeta.parse(spark, rows).collect()
    assert(out.length == 1 && out.head.media_id == "w")
    assert(out.head.duration_ms == 500L && out.head.channels == 2)
  }
}
