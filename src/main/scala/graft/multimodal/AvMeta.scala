package graft.multimodal

/** Audio/video CONTAINER header metadata — the honest non-codec half
  * of the multimodal story (reference analog: the header-sampling
  * digest tier, `DigestFactory.pm:105-116` reads container heads, not
  * decoded content). Sample-accurate pixel/PCM decode for these
  * formats needs codec jars this environment doesn't ship (the
  * clearly-marked `Media.decodeStub` swap-in point); container
  * STRUCTURE, though, is published byte layout and parses exactly:
  *
  *   - WAV / RIFF (Microsoft/IBM 1991 spec): chunk walk — `fmt `
  *     (format tag, channels, sample rate, byte rate, bits/sample)
  *     + `data` payload size → exact duration = data / byte-rate.
  *   - MP4 / ISO BMFF (ISO 14496-12): top-level box walk — `ftyp`
  *     major brand, `moov`/`mvhd` timescale + duration ticks,
  *     `trak` count. 64-bit largesize and version-1 mvhd handled.
  *   - MP3 (ISO 11172-3 frame header): sync + MPEG-1 Layer III
  *     bitrate/sample-rate tables, channel mode; an ID3v2 prefix is
  *     skipped via its syncsafe size; duration is the CBR estimate
  *     audio_bytes·8 / bitrate (documented: VBR streams need a
  *     Xing/VBRI header walk, out of scope).
  *   - Ogg (RFC 3533 pages): Vorbis/Opus ident-header facts, Theora
  *     brand; duration from the last page's granule position
  *     (bounded tail scan — the ffprobe technique).
  *
  * All integer arithmetic (floor division), so every field is exactly
  * reproducible by the SQL oracle (q_av_meta) — the NgramLm micro-nat
  * discipline applied to media metadata. Per-row byte work with no
  * allocation beyond the result: fuses into the scan as a map stage;
  * at 100 TB this runs beside the WARC ingest without a shuffle.
  */
object AvMeta {

  /** Parsed container facts; -1 marks fields the container doesn't
    * carry (e.g. sample rate for MP4 video) — never fabricated.
    */
  case class AvRow(
      media_id: String,
      container: String,
      kind: String,
      duration_ms: Long,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      tracks: Int,
      brand: String)

  /** Batched container-metadata extraction — same per-partition map
    * grain as [[Media.decode]] (no shuffle, fuses into the scan).
    * Rows whose magic no AV parser knows are DROPPED here (this is
    * the audit operator over known-AV payloads); mixed-media corpora
    * route through [[Media.decode]], whose tier 2½ keeps every row.
    */
  def parse(spark: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.Dataset[Media.MediaRow])
      : org.apache.spark.sql.Dataset[AvRow] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      parseAvMeta(m.payload).map(av =>
        AvRow(m.media_id, av.container, av.kind, av.duration_ms,
          av.sample_rate, av.channels, av.bits_per_sample, av.tracks, av.brand))
    })
  }

  case class AvInfo(
      container: String, // wav | mp4 | mp3
      kind: String, // audio | video (container class)
      duration_ms: Long, // -1 when the header can't bound it
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      tracks: Int,
      brand: String) // RIFF format tag / ftyp major brand / mpeg class

  // MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15
  // = bad — both rejected); sample rates by 2-bit index (3 reserved).
  private val Mp3BitrateKbps =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3SampleRate = Array(44100, 48000, 32000, -1)

  /** None when no known AV magic matches — callers fall through to
    * their own unknown tier (Media.decode's stub), never a fake.
    */
  def parseAvMeta(p: Array[Byte]): Option[AvInfo] = {
    if (p == null || p.length < 12) None
    else parseWav(p).orElse(parseMp4(p)).orElse(parseOgg(p)).orElse(parseMp3(p))
  }

  private def u(p: Array[Byte], i: Int): Int = p(i) & 0xff
  private def le16(p: Array[Byte], i: Int): Int = u(p, i) | (u(p, i + 1) << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    (le16(p, i).toLong) | (le16(p, i + 2).toLong << 16)
  private def be32(p: Array[Byte], i: Int): Long =
    (u(p, i).toLong << 24) | (u(p, i + 1).toLong << 16) | (u(p, i + 2).toLong << 8) | u(p, i + 3).toLong
  private def be64(p: Array[Byte], i: Int): Long = (be32(p, i) << 32) | be32(p, i + 4)
  private def tag(p: Array[Byte], i: Int): String =
    new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private case class WavLayout(fmtTag: Int, channels: Int, rate: Int,
      byteRate: Long, bits: Int, dataOff: Int, dataDeclared: Long)

  /** RIFF/WAVE chunk walk. Chunks are (4-byte id, le32 size, data)
    * padded to even offsets; `fmt ` is required, `data` bounds the
    * exact duration. A truncated or size-lying chunk ends the walk
    * (partial facts already gathered still count — crawl payloads
    * truncate).
    */
  private def wavLayout(p: Array[Byte]): Option[WavLayout] = {
    if (p.length < 12 || !(tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE")) return None
    var off = 12L // Long walk: a size-lying chunk must end the loop, not wrap it
    var fmtTag, channels, rate, bits = -1
    var byteRate = -1L
    var dataBytes = -1L
    var dataOff = -1
    while (off + 8 <= p.length) {
      val i = off.toInt
      val id = tag(p, i)
      val size = le32(p, i + 4) // unsigned: always >= 0
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= p.length) {
        fmtTag = le16(p, i + 8)
        channels = le16(p, i + 10)
        rate = le32(p, i + 12).toInt
        byteRate = le32(p, i + 16)
        bits = le16(p, i + 22)
      } else if (id == "data") { dataBytes = size; dataOff = i + 8 }
      off += 8 + size + (size & 1)
    }
    if (fmtTag < 0) None
    else Some(WavLayout(fmtTag, channels, rate, byteRate, bits, dataOff, dataBytes))
  }

  private def parseWav(p: Array[Byte]): Option[AvInfo] =
    wavLayout(p).map { l =>
      AvInfo("wav", "audio",
        if (l.byteRate > 0 && l.dataDeclared >= 0) l.dataDeclared * 1000L / l.byteRate else -1L,
        l.rate, l.channels, l.bits, 1,
        if (l.fmtTag == 1) "pcm" else s"fmt${l.fmtTag}")
    }

  // --- PCM audio features + near-dup fingerprint --------------------

  /** Decoded PCM samples, centered at 0 — honest REAL decode: PCM WAV
    * is raw samples, no codec needed (8-bit unsigned − 128, 16-bit LE
    * signed; all channels interleaved as stored). None for non-PCM
    * format tags or other widths (the codec swap-in point). A
    * truncated `data` chunk clamps to the bytes present — a cut-off
    * crawl payload still yields its prefix, never an exception.
    */
  def pcmSamples(p: Array[Byte]): Option[Array[Int]] =
    (if (p == null || p.length < 12) None else wavLayout(p)).flatMap { l =>
      if (l.fmtTag != 1 || (l.bits != 8 && l.bits != 16) || l.dataOff < 0) None
      else {
        val step = l.bits / 8
        val n = (math.min(l.dataDeclared, (p.length - l.dataOff).toLong) / step).toInt
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) =
            if (step == 1) (p(l.dataOff + i) & 0xff) - 128
            else le16(p, l.dataOff + 2 * i).toShort.toInt
          i += 1
        }
        Some(out)
      }
    }

  /** Integer-exact audio facts + a 64-bit energy-delta fingerprint:
    * the time-domain variant of Haitsma-Kalker (2002) robust audio
    * hashing — their sign-of-band-energy-difference bits, computed
    * over `windows` equal time windows instead of FFT bands (no FFT
    * dependency, and Long integer sums make the fingerprint
    * bit-identical across partitionings and engines — the PageRank
    * discipline). Bit k = [E(k+1) > E(k)] over 65 windows → 64 bits;
    * amplitude-scaling a stream flips no bit whose comparison is
    * strict, so near-identical PCM lands within a small Hamming ball
    * and the fingerprints feed `SimHash.edgesFromFingerprints`
    * UNCHANGED (the Manku prober is fingerprint-generic, exact by
    * pigeonhole — the image-dHash precedent).
    */
  case class AudioFacts(n_samples: Int, total_energy: Long,
      zero_crossings: Int, fp: Long)

  def audioFacts(p: Array[Byte], windows: Int = 65): Option[AudioFacts] =
    pcmSamples(p).flatMap { s =>
      val n = s.length
      if (n < windows) None // too short to fingerprint
      else {
        var te = 0L; var zc = 0; var i = 0
        while (i < n) {
          te += s(i).toLong * s(i)
          if (i > 0 && s(i - 1).toLong * s(i) < 0) zc += 1
          i += 1
        }
        var fp = 0L
        var prev = 0L
        var k = 0
        while (k < windows) {
          val lo = (k.toLong * n / windows).toInt
          val hi = ((k + 1).toLong * n / windows).toInt
          var acc = 0L; var j = lo
          while (j < hi) { acc += s(j).toLong * s(j); j += 1 }
          if (k > 0 && k <= 64 && acc > prev) fp |= 1L << (k - 1)
          prev = acc
          k += 1
        }
        Some(AudioFacts(n, te, zc, fp))
      }
    }

  /** (id, simhash) audio fingerprint frame — the audio analog of
    * `Media.dHashes`, feeding the same Hamming-ball prober for audio
    * near-dup edges. Non-PCM / too-short payloads yield a null
    * fingerprint (excluded from probing — never a byte-noise hash).
    */
  def audioHashes(spark: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.Dataset[Media.MediaRow])
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    media.map(m => (m.media_id, audioFacts(m.payload).map(_.fp)))
      .toDF("id", "simhash")
  }

  /** ISO-BMFF box walk: `ftyp` must lead (ISO 14496-12 §4.3); `moov`
    * children give mvhd timescale/duration and the trak count. Box
    * size 1 → 64-bit largesize; size 0 (to-end-of-file) only legal
    * for the last top-level box.
    */
  private def parseMp4(p: Array[Byte]): Option[AvInfo] = {
    if (tag(p, 4) != "ftyp") return None
    val brand = tag(p, 8)
    var off = 0L
    var timescale = -1L
    var durationTicks = -1L
    var tracks = 0
    def boxAt(i: Long): (String, Long, Long) = { // (type, payloadOff, end)
      val sz = be32(p, i.toInt)
      val t = tag(p, i.toInt + 4)
      if (sz == 1L && i + 16 <= p.length) (t, i + 16, i + be64(p, i.toInt + 8))
      else if (sz == 0L) (t, i + 8, p.length.toLong)
      else (t, i + 8, i + sz)
    }
    while (off + 8 <= p.length) {
      val (t, payload, end) = boxAt(off)
      // a truncated/size-lying box ends the walk, but the container is
      // already IDENTIFIED by its ftyp — return the partial facts
      // (duration -1 when mvhd never arrived, e.g. mdat-before-moov
      // cut mid-mdat, the common non-faststart crawl truncation)
      // rather than None, which would route the payload to the
      // unknown-magic stub and fabricate dimensions (the wavLayout
      // truncation discipline)
      if (end <= off || end > p.length) return finishMp4(brand, timescale, durationTicks, tracks)
      if (t == "moov") {
        var c = payload
        while (c + 8 <= end) {
          val (ct, cPayload, cEnd) = boxAt(c)
          if (cEnd <= c || cEnd > end) return finishMp4(brand, timescale, durationTicks, tracks)
          if (ct == "mvhd" && cPayload + 4 <= end) {
            val version = u(p, cPayload.toInt)
            if (version == 1 && cPayload + 32 <= end) {
              timescale = be32(p, cPayload.toInt + 20)
              durationTicks = be64(p, cPayload.toInt + 24)
            } else if (version == 0 && cPayload + 20 <= end) {
              timescale = be32(p, cPayload.toInt + 12)
              durationTicks = be32(p, cPayload.toInt + 16)
            }
          } else if (ct == "trak") tracks += 1
          c = cEnd
        }
      }
      off = end
    }
    finishMp4(brand, timescale, durationTicks, tracks)
  }

  private def finishMp4(brand: String, timescale: Long, ticks: Long,
      tracks: Int): Option[AvInfo] =
    Some(AvInfo("mp4", "video",
      if (timescale > 0 && ticks >= 0) ticks * 1000L / timescale else -1L,
      -1, -1, -1, tracks, brand))

  /** Ogg (RFC 3533) page walk: the first page's packet identifies the
    * codec — Vorbis ident header (version/channels/rate), OpusHead
    * (channels, input rate; the granule clock is ALWAYS 48 kHz per
    * RFC 7845 §4), Theora brand-only. Duration comes from the LAST
    * page header's granule position (the sample count for audio
    * codecs) found by a bounded 64 KB tail scan — the ffprobe
    * technique; a payload truncated mid-stream yields the last
    * complete page's position, an honest lower bound.
    */
  private def parseOgg(p: Array[Byte]): Option[AvInfo] = {
    if (tag(p, 0) != "OggS" || p.length < 28) return None
    val nseg = u(p, 26)
    val pk = 27 + nseg // first packet of the first page
    def bytesAt(i: Int, s: String): Boolean =
      i + s.length <= p.length && s.indices.forall(j => u(p, i + j) == s.charAt(j))
    // last complete page header's granule position (le64 at +6). The
    // capture pattern is validated beyond the 4 magic bytes: stream
    // structure version must be 0 and the header-type flags fit in 3
    // bits (RFC 3533 §6) — a literal "OggS" inside packet payload or
    // a comment string must not be read as a page header
    def lastGranule: Long = {
      var best = -1L
      var i = math.max(0, p.length - 65536)
      while (i + 14 <= p.length) {
        if (u(p, i) == 'O' && bytesAt(i, "OggS") && u(p, i + 4) == 0 && u(p, i + 5) < 8) {
          val g = le32(p, i + 6) | (le32(p, i + 10) << 32)
          if (g >= 0) best = g // -1 marks a continuation page: skip
        }
        i += 1
      }
      best
    }
    if (pk < p.length && u(p, pk) == 1 && bytesAt(pk + 1, "vorbis") && pk + 16 <= p.length) {
      val channels = u(p, pk + 11)
      val rate = le32(p, pk + 12).toInt
      val g = lastGranule
      Some(AvInfo("ogg", "audio",
        if (g > 0 && rate > 0) g * 1000L / rate else -1L,
        rate, channels, -1, 1, "vorbis"))
    } else if (bytesAt(pk, "OpusHead") && pk + 16 <= p.length) {
      val channels = u(p, pk + 9)
      val inputRate = le32(p, pk + 12).toInt
      val g = lastGranule
      Some(AvInfo("ogg", "audio",
        if (g > 0) g * 1000L / 48000L else -1L, // granules are 48 kHz by spec
        inputRate, channels, -1, 1, "opus"))
    } else if (bytesAt(pk + 1, "theora"))
      Some(AvInfo("ogg", "video", -1L, -1, -1, -1, 1, "theora"))
    else Some(AvInfo("ogg", "av", -1L, -1, -1, -1, 1, "unknown"))
  }

  /** MPEG-1 Layer III frame-header parse; an ID3v2 prefix (ubiquitous
    * on crawled MP3s) is skipped via its syncsafe size so the frame
    * header AND the CBR duration estimate see only audio bytes.
    */
  private def parseMp3(p: Array[Byte]): Option[AvInfo] = {
    var off = 0
    if (p.length >= 10 && u(p, 0) == 'I' && u(p, 1) == 'D' && u(p, 2) == '3') {
      // syncsafe: 7 bits per byte (ID3v2 §3.1); footer flag adds 10
      val size = (u(p, 6) << 21) | (u(p, 7) << 14) | (u(p, 8) << 7) | u(p, 9)
      off = 10 + size + (if ((u(p, 5) & 0x10) != 0) 10 else 0)
    }
    if (off + 4 > p.length || u(p, off) != 0xff || (u(p, off + 1) & 0xe0) != 0xe0) return None
    val versionBits = (u(p, off + 1) >> 3) & 3
    val layerBits = (u(p, off + 1) >> 1) & 3
    if (versionBits != 3 || layerBits != 1) return None // MPEG-1 Layer III only
    val bitrateKbps = Mp3BitrateKbps((u(p, off + 2) >> 4) & 15)
    val sampleRate = Mp3SampleRate((u(p, off + 2) >> 2) & 3)
    if (bitrateKbps <= 0 || sampleRate <= 0) return None
    val mode = (u(p, off + 3) >> 6) & 3
    Some(AvInfo("mp3", "audio",
      (p.length - off).toLong * 8L / bitrateKbps, // CBR estimate over audio bytes
      sampleRate, if (mode == 3) 1 else 2, -1, 1, "mpeg1-layer3"))
  }

  // --- deterministic fixture builders (valid headers + real-shaped
  // bodies) — tests and the q_av_meta driver query parse these against
  // closed-form ground truth; no external data -------------------------

  /** PCM WAV: RIFF + fmt(16) + data of silence. */
  def wavBytes(rate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataBytes = nSamples * blockAlign
    val byteRate = rate * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes); w32(36L + dataBytes); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16L)
    w16(1); w16(channels); w32(rate.toLong); w32(byteRate.toLong); w16(blockAlign); w16(bits)
    out.write("data".getBytes); w32(dataBytes.toLong)
    out.write(new Array[Byte](dataBytes))
    out.toByteArray
  }

  /** 8-bit mono PCM WAV with the given centered samples (−128..127
    * stored as unsigned+128) — the fixture builder for real-PCM
    * feature/fingerprint tests and the q_audio_fp oracle.
    */
  def wavPcm8Bytes(rate: Int, samples: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes); w32(36L + samples.length); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16L)
    w16(1); w16(1); w32(rate.toLong); w32(rate.toLong); w16(1); w16(8)
    out.write("data".getBytes); w32(samples.length.toLong)
    samples.foreach(s => out.write((s + 128) & 0xff))
    out.toByteArray
  }

  /** Minimal ISO-BMFF: ftyp(brand) + moov(mvhd v0 + empty trak boxes). */
  def mp4Bytes(brand: String, timescale: Int, durationTicks: Long, tracks: Int): Array[Byte] = {
    require(brand.length == 4, "ftyp major brand is 4 ASCII chars")
    val out = new java.io.ByteArrayOutputStream()
    def b32(v: Long): Unit = (3 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    // ftyp: size 16 = header 8 + brand 4 + minor_version 4
    b32(16L); out.write("ftyp".getBytes); out.write(brand.getBytes); b32(0L)
    // moov: mvhd v0 (108 bytes total) + tracks empty trak boxes
    b32(8L + 108L + tracks * 8L); out.write("moov".getBytes)
    b32(108L); out.write("mvhd".getBytes)
    b32(0L) // version 0 + flags
    b32(0L); b32(0L) // creation/modification
    b32(timescale.toLong); b32(durationTicks)
    out.write(new Array[Byte](108 - 8 - 4 - 8 - 8)) // rate..next_track zeros
    (0 until tracks).foreach { _ => b32(8L); out.write("trak".getBytes) }
    out.toByteArray
  }

  /** ID3v2.3 tag of `bodySize` zero bytes (syncsafe size field) — the
    * prefix real crawled MP3s carry before their first frame.
    */
  def id3v2Bytes(bodySize: Int): Array[Byte] = {
    require(bodySize >= 0 && bodySize < (1 << 28), "syncsafe size is 28 bits")
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes); out.write(3); out.write(0); out.write(0) // v2.3, no flags
    (3 to 0 by -1).foreach(i => out.write((bodySize >> (7 * i)) & 0x7f))
    out.write(new Array[Byte](bodySize))
    out.toByteArray
  }

  /** Two-page Ogg/Vorbis stream: page 0 (bos) carries the ident
    * header, the final page (eos) carries `granule` (= total PCM
    * samples) — enough structure for ident + tail-scan duration.
    */
  def oggVorbisBytes(rate: Int, channels: Int, granule: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32w(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def le64w(v: Long): Unit = (0 until 8).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def page(headerType: Int, gran: Long, seq: Int, packet: Array[Byte]): Unit = {
      require(packet.length < 255)
      out.write("OggS".getBytes); out.write(0); out.write(headerType)
      le64w(gran); le32w(1L); le32w(seq.toLong); le32w(0L) // serial/seq/crc
      out.write(1); out.write(packet.length) // one segment
      out.write(packet)
    }
    val ident = new java.io.ByteArrayOutputStream()
    ident.write(1); ident.write("vorbis".getBytes)
    (0 until 4).foreach(_ => ident.write(0)) // version 0
    ident.write(channels)
    (0 until 4).foreach(i => ident.write((rate >> (8 * i)) & 0xff))
    ident.write(new Array[Byte](12)); ident.write(0xb8); ident.write(1) // bitrates/blocksizes/framing
    page(0x02, 0L, 0, ident.toByteArray)
    page(0x04, granule, 1, Array[Byte](0))
    out.toByteArray
  }

  /** CBR MPEG-1 Layer III stream: nFrames frames of the standard
    * frame length floor(144 · bitrate / sampleRate), zero payload.
    */
  def mp3Bytes(bitrateIdx: Int, nFrames: Int, mono: Boolean): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, "bitrate index 1..14")
    val kbps = Mp3BitrateKbps(bitrateIdx)
    val frameLen = 144 * kbps * 1000 / 44100
    val frame = new Array[Byte](frameLen)
    frame(0) = 0xff.toByte
    frame(1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
    frame(2) = ((bitrateIdx << 4) | (0 << 2)).toByte // 44100 Hz, no padding
    frame(3) = (if (mono) 3 << 6 else 0).toByte
    val out = new java.io.ByteArrayOutputStream()
    (0 until nFrames).foreach(_ => out.write(frame))
    out.toByteArray
  }
}
