package graft.multimodal

/** Self-contained image codec for the two trivial uncompressed formats whose
  * specs need no external libraries: binary PPM (P6, Netpbm spec) and 24-bit
  * uncompressed BMP (BITMAPINFOHEADER). This replaces the round-1/2
  * hash-of-bytes stub: the decode path now parses a real header and real
  * pixel data, so the multimodal pipeline exercises an actual
  * bytes→dimensions→pixels decode while keeping the container dependency-free.
  * A production deployment swaps in JPEG/PNG/audio decoders behind the same
  * `decode` signature without touching the pipeline shape.
  */
object ImageCodec {

  /** Decoded image: pixels are row-major top-down RGB, 3 bytes per pixel. */
  final case class DecodedImage(format: String, width: Int, height: Int, pixels: Array[Byte])

  // ---------------------------------------------------------------- PPM (P6)

  /** Encode as binary PPM: `P6\n<w> <h>\n255\n` + raw RGB. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height, s"need ${3 * width * height} RGB bytes, got ${rgb.length}")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out    = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse binary PPM per the Netpbm spec: "P6", then three
    * whitespace-separated decimal tokens (width, height, maxval) with
    * `#`-comments allowed, then ONE whitespace byte, then 3wh raw bytes
    * (maxval must be < 256 for the 1-byte-per-sample form).
    */
  private def decodePpm(bytes: Array[Byte]): DecodedImage = {
    var pos = 2 // past "P6"
    def fail(msg: String) = throw new IllegalArgumentException(s"malformed PPM: $msg")
    def isWs(b: Byte)     = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
    def nextInt(): Int = {
      // skip whitespace and comment lines
      var done = false
      while (!done) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else done = true
      }
      if (pos >= bytes.length || bytes(pos) < '0' || bytes(pos) > '9') fail(s"expected integer at byte $pos")
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) fail("dimension overflow")
        pos += 1
      }
      v.toInt
    }
    val w      = nextInt()
    val h      = nextInt()
    val maxval = nextInt()
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    if (pos >= bytes.length || !isWs(bytes(pos))) fail("missing whitespace after maxval")
    pos += 1 // exactly one whitespace byte before raster data, per spec
    val n = 3 * w * h
    if (bytes.length - pos < n) fail(s"raster truncated: need $n bytes, have ${bytes.length - pos}")
    val pix = new Array[Byte](n)
    System.arraycopy(bytes, pos, pix, 0, n)
    DecodedImage("ppm", w, h, pix)
  }

  // ------------------------------------------------------------- BMP (24bpp)

  private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xff).toByte
    a(off + 1) = ((v >>> 8) & 0xff).toByte
    a(off + 2) = ((v >>> 16) & 0xff).toByte
    a(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def getIntLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) | ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)
  private def getShortLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)

  /** Encode as 24-bit uncompressed BMP (BITMAPINFOHEADER): rows stored
    * bottom-up as BGR, each padded to a 4-byte boundary.
    */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height, s"need ${3 * width * height} RGB bytes, got ${rgb.length}")
    val rowSize = (3 * width + 3) / 4 * 4
    val dataLen = rowSize * height
    val out     = new Array[Byte](54 + dataLen)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, out.length) // file size
    putIntLE(out, 10, 54)        // pixel data offset
    putIntLE(out, 14, 40)        // DIB header size
    putIntLE(out, 18, width)
    putIntLE(out, 22, height)    // positive => bottom-up
    out(26) = 1                  // planes
    out(28) = 24                 // bpp
    putIntLE(out, 30, 0)         // BI_RGB (uncompressed)
    putIntLE(out, 34, dataLen)
    var y = 0
    while (y < height) {
      val srcRow = (height - 1 - y) * 3 * width // bottom-up
      val dst    = 54 + y * rowSize
      var x = 0
      while (x < width) {
        out(dst + 3 * x) = rgb(srcRow + 3 * x + 2)     // B
        out(dst + 3 * x + 1) = rgb(srcRow + 3 * x + 1) // G
        out(dst + 3 * x + 2) = rgb(srcRow + 3 * x)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  private def decodeBmp(bytes: Array[Byte]): DecodedImage = {
    def fail(msg: String) = throw new IllegalArgumentException(s"malformed BMP: $msg")
    if (bytes.length < 54) fail("shorter than headers")
    val dataOff = getIntLE(bytes, 10)
    val w       = getIntLE(bytes, 18)
    val hRaw    = getIntLE(bytes, 22)
    val bpp     = getShortLE(bytes, 28)
    val compr   = getIntLE(bytes, 30)
    if (bpp != 24 || compr != 0) fail(s"only 24bpp uncompressed supported (bpp=$bpp compression=$compr)")
    if (w <= 0 || hRaw == 0) fail(s"bad dimensions ${w}x$hRaw")
    val h        = math.abs(hRaw)
    val topDown  = hRaw < 0
    val rowSize  = (3 * w + 3) / 4 * 4
    if (bytes.length < dataOff + rowSize * h) fail("pixel data truncated")
    val pix = new Array[Byte](3 * w * h)
    var y   = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowSize
      val dst    = y * 3 * w
      var x = 0
      while (x < w) {
        pix(dst + 3 * x) = bytes(srcRow + 3 * x + 2)     // R (stored BGR)
        pix(dst + 3 * x + 1) = bytes(srcRow + 3 * x + 1) // G
        pix(dst + 3 * x + 2) = bytes(srcRow + 3 * x)     // B
        x += 1
      }
      y += 1
    }
    DecodedImage("bmp", w, h, pix)
  }

  // ----------------------------------------------------------------- surface

  /** Decode by magic-number sniff: `P6` → PPM, `BM` → BMP. Throws
    * IllegalArgumentException on anything malformed (the strict form);
    * pipelines that should skip corrupt payloads use [[tryDecode]].
    */
  def decode(bytes: Array[Byte]): DecodedImage =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else throw new IllegalArgumentException("unknown image format (no PPM/BMP magic)")

  /** Skip-on-error decode for corpus pipelines: corrupt payloads become None
    * and fall out of the stream, like unparsable rows in the CSV paths.
    */
  def tryDecode(bytes: Array[Byte]): Option[DecodedImage] =
    try Some(decode(bytes))
    catch { case _: IllegalArgumentException => None }

  /** Nearest-neighbor resize to (ow, oh): out(x, y) samples
    * in(x·w/ow, y·h/oh) — integer floor, the standard NN mapping. Pure array
    * math over the decoded raster, no libraries; the thumbnail/downsample
    * stage of an image-curation pipeline.
    */
  def resizeNearest(img: DecodedImage, ow: Int, oh: Int): DecodedImage = {
    require(ow > 0 && oh > 0, s"bad target $ow x $oh")
    val out = new Array[Byte](3 * ow * oh)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * img.height / oh).toInt
      var x = 0
      while (x < ow) {
        val sx  = (x.toLong * img.width / ow).toInt
        val src = 3 * (sy * img.width + sx)
        val dst = 3 * (y * ow + x)
        out(dst) = img.pixels(src); out(dst + 1) = img.pixels(src + 1); out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    DecodedImage(img.format, ow, oh, out)
  }

  /** Per-channel byte sums over the raster — the cheap feature-extraction
    * stage (channel statistics / brightness screening) of an image pipeline.
    * Integer sums: order-independent and engine-replayable.
    */
  def channelSums(img: DecodedImage): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.pixels.length) {
      r += img.pixels(i) & 0xff
      g += img.pixels(i + 1) & 0xff
      b += img.pixels(i + 2) & 0xff
      i += 3
    }
    (r, g, b)
  }

  /** Frame sampling: up to `maxFrames` pixel rows evenly spaced from the top
    * (row i*h/min(h,max)), each digested with the rolling hash
    * h' = h*1000003 + byte over its 3w RGB bytes. Deterministic and
    * re-derivable from the format spec alone — MultimodalSpec recomputes it
    * from raw encoded bytes without this code.
    */
  def frameHashes(img: DecodedImage, maxFrames: Int = 8): Seq[Long] = {
    val n = math.min(img.height, maxFrames)
    (0 until n).map { i =>
      val row = i.toLong * img.height / n
      val off = row.toInt * 3 * img.width
      var h   = 0L
      var j   = 0
      while (j < 3 * img.width) { h = h * 1000003L + (img.pixels(off + j) & 0xff); j += 1 }
      h
    }
  }
}
