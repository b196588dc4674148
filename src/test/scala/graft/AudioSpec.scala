package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Audio, AudioCodec}

/** The audio decode path: AudioCodec must implement the RIFF/WAV format spec
  * (asserted against hand-built spec-literal payloads and independent in-test
  * byte checks, NOT against the codec itself), tolerate unknown chunks with
  * odd-length padding, reject malformed/non-PCM payloads, and the DSP stages
  * (truncating linear resample, features) must match hand-computed values.
  */
class AudioSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val clip = Array[Short](0, 1000, -1000, 32767, -32768, 5)

  test("WAV encode writes the canonical spec header byte-for-byte") {
    val b = AudioCodec.encodeWav(8000, clip)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(b.slice(12, 16), "US-ASCII") == "fmt ")
    // fmt fields, independent little-endian reads
    assert(((b(20) & 0xff) | ((b(21) & 0xff) << 8)) == 1, "PCM format tag")
    assert(((b(22) & 0xff) | ((b(23) & 0xff) << 8)) == 1, "mono")
    assert(((b(24) & 0xff) | ((b(25) & 0xff) << 8) | ((b(26) & 0xff) << 16) | ((b(27) & 0xff) << 24)) == 8000)
    assert(((b(34) & 0xff) | ((b(35) & 0xff) << 8)) == 16, "bits per sample")
    assert(new String(b.slice(36, 40), "US-ASCII") == "data")
    assert(b.length == 44 + 2 * clip.length)
    // PCM16LE: sample 1 (=1000 = 0x03E8) stored low byte first at offset 46
    assert((b(46) & 0xff) == 0xe8 && (b(47) & 0xff) == 0x03)
    // negative sample round-trips two's complement: -1000 = 0xFC18
    assert((b(48) & 0xff) == 0x18 && (b(49) & 0xff) == 0xfc)
  }

  test("WAV decode round-trips samples exactly, including int16 extremes") {
    val w = AudioCodec.decode(AudioCodec.encodeWav(8000, clip))
    assert(w.sampleRate == 8000)
    assert(w.samples.toSeq == clip.toSeq)
  }

  test("chunk walk skips unknown chunks and honors RIFF even-byte padding") {
    // Hand-assemble: RIFF [ LIST(3 bytes, padded to 4) | fmt | data ]
    val base = AudioCodec.encodeWav(4000, Array[Short](7, -7))
    val fmtAndData = base.drop(12)
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0) // len 3 + 1 pad
    val total = 4 + list.length + fmtAndData.length
    val out = new Array[Byte](8) ++ Array[Byte]('W', 'A', 'V', 'E') ++ list ++ fmtAndData
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    out(4) = (total & 0xff).toByte; out(5) = ((total >> 8) & 0xff).toByte
    out(6) = ((total >> 16) & 0xff).toByte; out(7) = ((total >> 24) & 0xff).toByte
    val w = AudioCodec.decode(out)
    assert(w.sampleRate == 4000 && w.samples.toSeq == Seq[Short](7, -7))
  }

  test("corrupt / non-PCM payloads are rejected, not mis-parsed") {
    assert(AudioCodec.tryDecode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.tryDecode("RIFFxxxxAIFF".getBytes("US-ASCII")).isEmpty)
    val good = AudioCodec.encodeWav(8000, clip)
    val stereo = good.clone(); stereo(22) = 2 // channels=2 in fmt
    assert(AudioCodec.tryDecode(stereo).isEmpty, "stereo must be rejected")
    val truncated = good.take(good.length - 3)
    assert(AudioCodec.tryDecode(truncated).isEmpty, "data chunk overrun")
  }

  test("linear resample matches hand-computed truncating interpolation") {
    // n=3 -> m=5: positions j*(2)/4: lo/frac = 0/0, 0/2, 1/0, 1/2, 2/0
    val s = Array[Short](100, 200, -100)
    val out = AudioCodec.resampleLinear(s, 5)
    // j=1: 100 + (200-100)*2/4 = 150 ; j=3: 200 + (-100-200)*2/4 = 200 - 150 = 50
    assert(out.toSeq == Seq(100, 150, 200, 50, -100))
    // truncating (not floor) division on negatives, matching DuckDB `//`:
    // 0 + (-5-0)*1/4 = -1 (trunc), not -2 (floor)
    val neg = AudioCodec.resampleLinear(Array[Short](0, -5), 5)
    assert(neg.toSeq == Seq(0, -1, -2, -3, -5))
  }

  test("synthetic clips span int16 exactly and stay in range") {
    val w = AudioCodec.decode(Audio.syntheticWav("hello world, synthetic audio"))
    assert(w.sampleRate == Audio.SampleRate)
    assert(w.samples.length == "hello world, synthetic audio".length % 240 + 16)
    assert(w.samples.forall(v => v >= Short.MinValue && v <= Short.MaxValue))
    // empty text pads to one 0 byte -> n = 1 % 240 + 16 = 17 samples
    assert(AudioCodec.decode(Audio.syntheticWav("")).samples.length == 17)
  }

  test("features match a hand-computed tiny clip") {
    import spark.implicits._
    val payload = AudioCodec.encodeWav(8000, Array[Short](10, -20, 30, 0, -1))
    val ds = spark.createDataset(Seq((1L, payload)))
    val f = Audio.extractFeatures(spark, ds, frame = 2).collect().head
    // |10|+|−20|+|30|+|0|+|−1| = 61; crossings at 10→−20, −20→30, 0→−1 = 3
    assert(f.n_frames == 2 && f.energy_sum == 61L && f.zero_cross == 3 && f.peak_abs == 30)
  }

  test("fingerprint: identical clips collide, a light edit flips few bits") {
    import spark.implicits._
    val base = Array.tabulate[Short](200)(k => (((k * 7919) % 4000) - 2000).toShort)
    val edited = base.clone()
    edited(50) = (edited(50) + 300).toShort // small local amplitude edit
    val ds = spark.createDataset(Seq(
      (1L, AudioCodec.encodeWav(8000, base)),
      (2L, AudioCodec.encodeWav(8000, base)),
      (3L, AudioCodec.encodeWav(8000, edited))))
    val fp = Audio.fingerprint(spark, ds).collect().map(r => r.doc_id -> r.fp).toMap
    assert(fp(1L) == fp(2L), "identical clips must share the fingerprint")
    val hamming = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(hamming <= 4, s"a local edit must flip few sign bits, flipped $hamming")
  }

  test("corrupt payloads are skipped by the pipeline stages (curation convention)") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      (1L, AudioCodec.encodeWav(8000, clip)),
      (2L, Array[Byte](9, 9, 9))))
    assert(Audio.decodeMeta(spark, ds).collect().map(_.doc_id).toSeq == Seq(1L))
  }
}
