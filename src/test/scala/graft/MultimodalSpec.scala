package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import graft.multimodal.{ImageCodec, Multimodal}

/** The multimodal decode path: ImageCodec must implement the PPM/BMP format
  * specs (asserted against hand-built spec-literal payloads and an
  * independent in-test parse, NOT against the codec itself), corrupt payloads
  * must be skipped, and the registered query must stay scalar-only (the
  * driver's compare harness cannot sort array columns — round-1 regression).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rgb2x2 = Array[Byte](
    10, 20, 30,   40, 50, 60,  // row 0: (R,G,B) (R,G,B)
    70, 80, 90,  100, 110, 120 // row 1
  )

  test("PPM encode/decode round-trips pixels exactly") {
    val img = ImageCodec.decode(ImageCodec.encodePpm(2, 2, rgb2x2))
    assert(img.format == "ppm" && img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == rgb2x2.toSeq)
  }

  test("PPM decode handles spec whitespace and comment forms") {
    // Netpbm spec: tokens may be separated by any whitespace, '#' starts a
    // comment to end-of-line, exactly one whitespace byte precedes the raster.
    val header = "P6 # comment after magic\n2\t2 # dims\n# full comment line\n255\n"
    val bytes  = header.getBytes("US-ASCII") ++ rgb2x2
    val img    = ImageCodec.decode(bytes)
    assert(img.width == 2 && img.height == 2 && img.pixels.toSeq == rgb2x2.toSeq)
  }

  test("BMP encode/decode round-trips (bottom-up rows, BGR order, row padding)") {
    // 2x2: rowSize = (3*2+3)/4*4 = 8 => 2 padding bytes per row exercises padding
    val bmp = ImageCodec.encodeBmp(2, 2, rgb2x2)
    // spec-literal checks on the encoded bytes, independent of the decoder:
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    assert((bmp(28) & 0xff) == 24, "bpp field")
    assert(bmp.length == 54 + 8 * 2, "54-byte headers + 2 padded rows")
    // bottom-up: first stored row is image row 1; BGR: first byte is row 1's B
    assert(bmp(54) == 90 && bmp(55) == 80 && bmp(56) == 70)
    val img = ImageCodec.decode(bmp)
    assert(img.format == "bmp" && img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == rgb2x2.toSeq)
  }

  test("decodeFrames parses real PPM payloads; fields match an independent in-test parse") {
    val docs    = Tables.documents(spark, TestSpark.sf0001).limit(25)
    val decoded = Multimodal.decodeFrames(spark, Multimodal.withImagePayload(spark, docs))
      .collect().map(m => m.doc_id -> m).toMap
    val raw = Multimodal.withImagePayload(spark, docs).collect()
    assert(raw.nonEmpty)
    raw.foreach { case (id, bytes) =>
      val m = decoded(id)
      // independent parse from the format spec (regex header, manual raster)
      val headerStr = new String(bytes.take(32), "US-ASCII")
      val hdr       = """P6\n(\d+) (\d+)\n255\n""".r.findPrefixMatchOf(headerStr).get
      val (w, h)    = (hdr.group(1).toInt, hdr.group(2).toInt)
      val raster    = bytes.drop(hdr.end)
      assert(m.n_bytes == bytes.length.toLong)
      assert(m.width == w && m.height == h)
      assert(raster.length == 3 * w * h)
      // frame hashes: up to 8 evenly spaced rows, rolling hash h*1000003+b
      val n = math.min(h, 8)
      val want = (0 until n).map { i =>
        val off = (i.toLong * h / n).toInt * 3 * w
        raster.slice(off, off + 3 * w).foldLeft(0L)((acc, b) => acc * 1000003L + (b & 0xff))
      }
      assert(m.frame_hashes == want, s"frame hashes differ for doc $id")
    }
  }

  test("corrupt payloads are skipped, not fatal") {
    import spark.implicits._
    val good      = Multimodal.syntheticPpm("hello world")
    val truncated = good.dropRight(3)            // raster short by one pixel
    val garbage   = "not an image".getBytes("UTF-8")
    val ds  = spark.createDataset(Seq((1L, good), (2L, truncated), (3L, garbage)))
    val out = Multimodal.decodeFrames(spark, ds).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
  }

  test("x_multimodal_frames output is scalar-only (driver compare cannot sort arrays)") {
    val df = graft.queries.Extensions.multimodalFrames.run(spark, TestSpark.sf0001)
    val arrayCols = df.schema.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
    assert(arrayCols.isEmpty, s"array-typed output columns would crash the harness: $arrayCols")
  }

  test("resizeNearest: exact NN mapping on a hand-built image, independent of the generator") {
    // 4x2 image whose pixel (x, y) carries (10x+y, 100+x, 200+y): every
    // sampled source is uniquely identifiable from the channel values.
    val w = 4; val h = 2
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 3 * (y * w + x)
      px(o) = (10 * x + y).toByte; px(o + 1) = (100 + x).toByte; px(o + 2) = (200 + y).toByte
    }
    val img = graft.multimodal.ImageCodec.decode(
      graft.multimodal.ImageCodec.encodePpm(w, h, px))
    val out = graft.multimodal.ImageCodec.resizeNearest(img, 2, 1)
    // NN: out(0,0) <- in(0*4/2, 0*2/1) = in(0,0); out(1,0) <- in(2,0).
    assert(out.width == 2 && out.height == 1)
    assert((out.pixels(0) & 0xff, out.pixels(1) & 0xff, out.pixels(2) & 0xff) == (0, 100, 200))
    assert((out.pixels(3) & 0xff, out.pixels(4) & 0xff, out.pixels(5) & 0xff) == (20, 102, 200))
    // Identity resize returns the raster unchanged.
    val same = graft.multimodal.ImageCodec.resizeNearest(img, w, h)
    assert(same.pixels.toSeq == px.toSeq)
    // Channel sums recompute from the raw raster independently.
    val (r, g, b) = graft.multimodal.ImageCodec.channelSums(img)
    val wantR = (for (y <- 0 until h; x <- 0 until w) yield 10 * x + y).sum.toLong
    val wantG = (for (y <- 0 until h; x <- 0 until w) yield 100 + x).sum.toLong
    val wantB = (for (y <- 0 until h; x <- 0 until w) yield 200 + y).sum.toLong
    assert((r, g, b) == ((wantR, wantG, wantB)))
  }

  test("averageHash: identical images collide, light edits stay Hamming-close, distinct images differ") {
    import spark.implicits._
    val base   = "the quick brown fox jumps over the lazy dog " * 8
    val edited = base.dropRight(1) + "!" // one byte changed out of ~350
    val other  = "completely different content with other letters " * 8
    val ds = spark.createDataset(Seq(
      (1L, Multimodal.syntheticPpm(base)),
      (2L, Multimodal.syntheticPpm(base)),   // byte-identical image
      (3L, Multimodal.syntheticPpm(edited)), // near-dup image
      (4L, Multimodal.syntheticPpm(other))))
    val h = Multimodal.averageHash(spark, ds).collect().map(a => a.doc_id -> (a.ahash_hi, a.ahash_lo)).toMap
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(h(1L) == h(2L), "identical images must hash identically")
    assert(hamming(h(1L), h(3L)) <= 8,
      s"a 1-byte edit must stay Hamming-close, got ${hamming(h(1L), h(3L))}")
    assert(hamming(h(1L), h(4L)) > 8,
      s"distinct images must differ, got ${hamming(h(1L), h(4L))}")
  }

  test("resize and feature stages skip corrupt payloads like the decode stage") {
    import spark.implicits._
    val good    = Multimodal.syntheticPpm("resize me")
    val garbage = "nope".getBytes("UTF-8")
    val ds = spark.createDataset(Seq((1L, good), (2L, garbage)))
    assert(Multimodal.resizeImages(spark, ds).collect().map(_.doc_id).toSeq == Seq(1L))
    assert(Multimodal.channelStats(spark, ds).collect().map(_.doc_id).toSeq == Seq(1L))
  }
}
