package graft.multimodal

/** Minimal REAL WAV (RIFF / PCM16LE mono) codec — no external libraries.
  *
  * Mirrors [[ImageCodec]]'s role for the audio modality: [[encodeWav]] writes
  * a spec-conformant 44-byte canonical header + little-endian 16-bit PCM data
  * chunk; [[decode]] re-parses it the hard way — RIFF magic, WAVE form type,
  * a chunk walk that tolerates non-`fmt `/`data` chunks (skipped, padded to
  * even offsets per the RIFF spec), format-tag/channel/bit-depth validation —
  * so the decoded sample rate and sample values come from parsing bytes, not
  * from trusting the synthesizer's formulas. Reference behavior: the
  * reference treats media blobs as opaque HyDFS payloads (see
  * `/root/reference` MP3 file-ops); the decode stage is the extension the
  * prompt's multimodal pipeline requires.
  */
object AudioCodec {

  /** Decoded PCM16 mono clip. */
  final case class Wav(sampleRate: Int, samples: Array[Short])

  private def le16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }
  private def rd16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")

  /** Canonical 44-byte-header PCM16LE mono WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = 2 * samples.length
    val out     = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16)          // fmt chunk size
    le16(out, 20, 1)           // PCM
    le16(out, 22, 1)           // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate = sr * block align
    le16(out, 32, 2)           // block align
    le16(out, 34, 16)          // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) { le16(out, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    out
  }

  /** Parse a PCM16 mono WAV: RIFF header check + chunk walk. Throws on
    * malformed input; [[tryDecode]] is the pipeline-facing face.
    */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, "truncated RIFF header")
    require(tag(bytes, 0) == "RIFF", "not RIFF")
    require(tag(bytes, 8) == "WAVE", "not WAVE")
    var off                   = 12
    var sampleRate            = -1
    var samples: Array[Short] = null
    var fmtSeen               = false
    while (off + 8 <= bytes.length && (samples == null || !fmtSeen)) {
      val id  = tag(bytes, off)
      val len = rd32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"chunk $id overruns buffer")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          require(rd16(bytes, off + 8) == 1, "not PCM")
          require(rd16(bytes, off + 10) == 1, "not mono")
          sampleRate = rd32(bytes, off + 12)
          require(rd16(bytes, off + 22) == 16, "not 16-bit")
          fmtSeen = true
        case "data" =>
          val n = len / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = rd16(bytes, off + 8 + 2 * i).toShort; i += 1 }
        case _ => () // skip unknown chunk (LIST, fact, …)
      }
      off += 8 + len + (len & 1) // RIFF chunks pad to even boundaries
    }
    require(fmtSeen, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    Wav(sampleRate, samples)
  }

  def tryDecode(bytes: Array[Byte]): Option[Wav] =
    try Some(decode(bytes))
    catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException => None }

  /** Linear resample to exactly `m` samples with TRUNCATING integer
    * interpolation (matches DuckDB `//` semantics so the oracle replays it
    * bit-exactly): position j maps to num = j·(n−1), lo = num quot (m−1),
    * frac = num rem (m−1), out(j) = s(lo) + (s(hi)−s(lo))·frac quot (m−1).
    * Works as decimation or upsampling; requires n ≥ 2, m ≥ 2.
    */
  def resampleLinear(samples: Array[Short], m: Int): Array[Int] = {
    val n = samples.length
    require(n >= 2 && m >= 2, "resample needs n >= 2 and m >= 2")
    val out = new Array[Int](m)
    var j   = 0
    while (j < m) {
      val num  = j.toLong * (n - 1)
      val lo   = (num / (m - 1)).toInt
      val frac = (num % (m - 1)).toInt
      out(j) =
        if (frac == 0) samples(lo).toInt
        else samples(lo) + ((samples(lo + 1) - samples(lo)).toLong * frac / (m - 1)).toInt
      j += 1
    }
    out
  }
}
