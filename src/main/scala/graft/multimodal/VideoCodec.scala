package graft.multimodal

/** Minimal REAL ISO-BMFF (MP4) subset codec — no external libraries.
  *
  * The video face of the multimodal family, mirroring [[AudioCodec]] (RIFF)
  * and [[ImageCodec]]: [[encodeMp4]] writes a structurally valid ISO base
  * media file — `ftyp` + `mdat` (concatenated raw gray8 frames) + `moov`
  * with the standard metadata box tree (`mvhd` timescale/duration, `trak >
  * tkhd` 16.16 fixed-point dimensions, `mdia > mdhd/hdlr/minf > stbl` with
  * `stsd`/`stts`/`stss`/`stsz`/`stsc`/`stco` sample tables) — and
  * [[decode]] re-parses it the hard way: a big-endian box walk that
  * tolerates unknown boxes, recurses into containers in any order, validates
  * every declared size against the buffer, cross-checks `stts` total vs
  * `stsz` entry count vs `mdat` extent, and slices per-frame payloads via
  * the `stco`/`stsc`/`stsz` chunk map. Decoded width/height/duration/
  * keyframes/frame bytes come from parsing, not from trusting the
  * synthesizer ([[Video.syntheticMp4]]) — a mis-encode, mis-parse, or
  * off-by-one in the chunk map breaks the byte-exact oracle comparison.
  *
  * Reference behavior: the reference stores media blobs as opaque HyDFS
  * payloads (MP3 file ops in its storage tests); the container-parse stage
  * is the extension the multimodal pipeline brief requires. Box layout per
  * ISO/IEC 14496-12 (public spec).
  */
object VideoCodec {

  /** Decoded clip: parsed container metadata + per-frame gray8 rasters. */
  final case class Mp4(
      brand: String,
      codec: String,
      timescale: Int,
      duration: Long,
      width: Int,
      height: Int,
      syncSamples: Array[Int],    // 1-based keyframe sample numbers (stss)
      frames: Array[Array[Byte]]) {
    def nFrames: Int      = frames.length
    def durationMs: Long  = duration * 1000L / timescale
  }

  private def be16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >> 8) & 0xff).toByte; b(o + 1) = (v & 0xff).toByte
  }
  private def be32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
    b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
  }
  private def rd32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def rd16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def tag(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")
  private def putTag(b: Array[Byte], o: Int, t: String): Unit = {
    val a = t.getBytes("US-ASCII"); require(a.length == 4, s"bad 4cc $t")
    System.arraycopy(a, 0, b, o, 4)
  }

  /** One box under construction: 4cc + payload (containers concat children). */
  private def box(t: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    be32(out, 0, out.length); putTag(out, 4, t)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var o   = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }

  /** Structurally valid single-track gray8 MP4. `sync` holds the 0-based
    * keyframe frame indices; all frames live in ONE chunk (stsc maps it),
    * `stco[0]` pointing at the mdat payload. Canonical sizes (mirrored by
    * the oracle's closed form): ftyp 16, mdat 8+Σframes, moov 445+4n+4·|sync|.
    */
  def encodeMp4(
      width: Int, height: Int, timescale: Int, sampleDelta: Int,
      frames: Array[Array[Byte]], sync: Array[Int]): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val n        = frames.length
    val duration = n.toLong * sampleDelta
    require(duration <= Int.MaxValue, "duration overflows 32-bit mvhd")

    val ftyp = {
      val p = new Array[Byte](8)
      putTag(p, 0, "isom"); be32(p, 4, 0)
      box("ftyp", p)
    }
    val mdatPayload = cat(frames: _*)
    val mdat        = box("mdat", mdatPayload)

    val mvhd = {
      val p = new Array[Byte](100)          // version 0 layout
      be32(p, 12, timescale); be32(p, 16, duration.toInt)
      be32(p, 20, 0x00010000)               // rate 1.0
      be16(p, 24, 0x0100)                   // volume 1.0
      // identity matrix
      be32(p, 36, 0x00010000); be32(p, 52, 0x00010000); be32(p, 68, 0x40000000)
      be32(p, 96, 2)                        // next_track_ID
      box("mvhd", p)
    }
    val tkhd = {
      val p = new Array[Byte](84)
      p(3) = 0x03                           // flags: enabled | in-movie
      be32(p, 12, 1)                        // track_ID
      be32(p, 20, duration.toInt)
      be32(p, 40, 0x00010000); be32(p, 56, 0x00010000); be32(p, 72, 0x40000000)
      be32(p, 76, width << 16)              // 16.16 fixed
      be32(p, 80, height << 16)
      box("tkhd", p)
    }
    val mdhd = {
      val p = new Array[Byte](24)
      be32(p, 12, timescale); be32(p, 16, duration.toInt)
      be16(p, 20, 0x55c4)                   // language 'und'
      box("mdhd", p)
    }
    val hdlr = {
      val p = new Array[Byte](25)           // ver/flags 4 + predefined 4 + type 4 + reserved 12 + "" NUL
      putTag(p, 8, "vide")
      box("hdlr", p)
    }
    val stsd = {
      val entry = new Array[Byte](16)       // minimal SampleEntry
      be32(entry, 0, 16); putTag(entry, 4, "gry8"); be16(entry, 14, 1)
      val p = new Array[Byte](8 + entry.length)
      be32(p, 4, 1)
      System.arraycopy(entry, 0, p, 8, entry.length)
      box("stsd", p)
    }
    val stts = {
      val p = new Array[Byte](16)
      be32(p, 4, 1); be32(p, 8, n); be32(p, 12, sampleDelta)
      box("stts", p)
    }
    val stss = {
      val p = new Array[Byte](8 + 4 * sync.length)
      be32(p, 4, sync.length)
      sync.zipWithIndex.foreach { case (f, i) => be32(p, 8 + 4 * i, f + 1) } // 1-based
      box("stss", p)
    }
    val stsz = {
      val p = new Array[Byte](12 + 4 * n)
      be32(p, 8, n)
      frames.zipWithIndex.foreach { case (fr, i) => be32(p, 12 + 4 * i, fr.length) }
      box("stsz", p)
    }
    val stsc = {
      val p = new Array[Byte](20)
      be32(p, 4, 1); be32(p, 8, 1); be32(p, 12, n); be32(p, 16, 1)
      box("stsc", p)
    }
    // stco points at the mdat PAYLOAD: ftyp(16) + mdat header(8)
    val stco = {
      val p = new Array[Byte](12)
      be32(p, 4, 1); be32(p, 8, ftyp.length + 8)
      box("stco", p)
    }
    val stbl = box("stbl", cat(stsd, stts, stss, stsz, stsc, stco))
    val minf = box("minf", stbl)
    val mdia = box("mdia", cat(mdhd, hdlr, minf))
    val trak = box("trak", cat(tkhd, mdia))
    val moov = box("moov", cat(mvhd, trak))
    cat(ftyp, mdat, moov)
  }

  /** Walk the children of buffer range [off, end), invoking f(type, payloadOff,
    * payloadLen) per box. Validates every declared size against the range.
    */
  private def walk(b: Array[Byte], off: Int, end: Int)(f: (String, Int, Int) => Unit): Unit = {
    var o = off
    while (o + 8 <= end) {
      val size = rd32(b, o)
      val t    = tag(b, o + 4)
      require(size >= 8, s"box $t declares size $size < 8")
      require(o + size <= end, s"box $t overruns container")
      f(t, o + 8, size - 8)
      o += size
    }
    require(o == end, "trailing garbage after last box")
  }

  /** Parse the subset written by [[encodeMp4]] plus unknown-box tolerance:
    * any box type not consumed below is skipped (free/udta/…); container
    * recursion is explicit so a `moov` after `mdat` (or vice versa) parses
    * the same. Throws IllegalArgumentException on malformed input;
    * [[tryDecode]] is the pipeline-facing face.
    */
  def decode(bytes: Array[Byte]): Mp4 = {
    require(bytes.length >= 16, "truncated file")
    require(tag(bytes, 4) == "ftyp", "first box must be ftyp")
    val brand = tag(bytes, 8)

    var codec: String          = null
    var timescale              = -1
    var duration               = -1L
    var width, height          = -1
    var sync: Array[Int]       = Array.empty
    var sizes: Array[Int]      = null
    var sttsTotal              = -1L
    var chunkOff               = -1
    var stscOk                 = false
    var mdatOff, mdatLen       = -1

    def parseStbl(off: Int, len: Int): Unit = walk(bytes, off, off + len) {
      case ("stsd", o, l) =>
        require(l >= 16, "stsd too short")
        val nEntries = rd32(bytes, o + 4)
        require(nEntries == 1, s"expected 1 stsd entry, got $nEntries")
        require(rd32(bytes, o + 8) >= 16, "sample entry too short")
        codec = tag(bytes, o + 12)
      case ("stts", o, l) =>
        val nEntries = rd32(bytes, o + 4)
        require(l >= 8 + 8 * nEntries, "stts overruns")
        var t = 0L; var i = 0
        while (i < nEntries) { t += rd32(bytes, o + 8 + 8 * i).toLong; i += 1 }
        sttsTotal = t
      case ("stss", o, l) =>
        val nEntries = rd32(bytes, o + 4)
        require(l >= 8 + 4 * nEntries, "stss overruns")
        sync = Array.tabulate(nEntries)(i => rd32(bytes, o + 8 + 4 * i))
      case ("stsz", o, l) =>
        require(rd32(bytes, o + 4) == 0, "fixed sample size unsupported")
        val nEntries = rd32(bytes, o + 8)
        require(l >= 12 + 4 * nEntries, "stsz overruns")
        sizes = Array.tabulate(nEntries)(i => rd32(bytes, o + 12 + 4 * i))
      case ("stsc", o, l) =>
        val nEntries = rd32(bytes, o + 4)
        require(nEntries == 1 && l >= 16, "only single-chunk stsc supported")
        require(rd32(bytes, o + 8) == 1, "first_chunk must be 1")
        stscOk = true
      case ("stco", o, l) =>
        val nEntries = rd32(bytes, o + 4)
        require(nEntries == 1 && l >= 12, "only single-chunk stco supported")
        chunkOff = rd32(bytes, o + 8)
      case _ => ()
    }
    def parseMinf(off: Int, len: Int): Unit = walk(bytes, off, off + len) {
      case ("stbl", o, l) => parseStbl(o, l)
      case _              => ()
    }
    def parseMdia(off: Int, len: Int): Unit = walk(bytes, off, off + len) {
      case ("minf", o, l) => parseMinf(o, l)
      case _              => () // mdhd duplicates mvhd's timescale here; hdlr skipped
    }
    def parseTrak(off: Int, len: Int): Unit = walk(bytes, off, off + len) {
      case ("tkhd", o, l) =>
        require(l >= 84, "tkhd too short")
        width = rd32(bytes, o + 76) >>> 16    // 16.16 fixed
        height = rd32(bytes, o + 80) >>> 16
      case ("mdia", o, l) => parseMdia(o, l)
      case _              => ()
    }
    def parseMoov(off: Int, len: Int): Unit = walk(bytes, off, off + len) {
      case ("mvhd", o, l) =>
        require(l >= 100, "mvhd too short")
        timescale = rd32(bytes, o + 12)
        duration = rd32(bytes, o + 16).toLong & 0xffffffffL
      case ("trak", o, l) => parseTrak(o, l)
      case _              => ()
    }
    walk(bytes, 0, bytes.length) {
      case ("mdat", o, l) => mdatOff = o; mdatLen = l
      case ("moov", o, l) => parseMoov(o, l)
      case _              => ()
    }

    require(mdatOff >= 0, "missing mdat")
    require(timescale > 0, "missing/invalid mvhd")
    require(width > 0 && height > 0, "missing/invalid tkhd dims")
    require(codec != null, "missing stsd")
    require(sizes != null, "missing stsz")
    require(stscOk && chunkOff >= 0, "missing chunk map")
    require(sttsTotal == sizes.length, s"stts total $sttsTotal != stsz count ${sizes.length}")
    require(sync.forall(s => s >= 1 && s <= sizes.length), "stss sample out of range")

    val frames = new Array[Array[Byte]](sizes.length)
    var o      = chunkOff
    var i      = 0
    while (i < sizes.length) {
      require(o >= mdatOff && o + sizes(i) <= mdatOff + mdatLen, s"frame $i outside mdat")
      frames(i) = java.util.Arrays.copyOfRange(bytes, o, o + sizes(i))
      o += sizes(i)
      i += 1
    }
    Mp4(brand, codec, timescale, duration, width, height, sync, frames)
  }

  def tryDecode(bytes: Array[Byte]): Option[Mp4] =
    try Some(decode(bytes))
    catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException => None }
}
