package graft.multimodal

/** Pure-JVM PPM (P6 / binary, maxval 255) image codec — a REAL decode
  * path for the multimodal plumbing: rounds 1-4 stubbed the codec because
  * the container ships no image libraries, but P6 needs none. The format
  * is the netpbm spec: ASCII header `P6 <width> <height> <maxval>` with
  * `#` comments and arbitrary whitespace, then `width*height*3` raw RGB
  * bytes.
  *
  * This is deliberately a tiny single-pass parser (no regex, no string
  * split of the pixel body) — it runs once per row inside a
  * `mapPartitions` batch, so per-call allocation is what matters. */
object Ppm {

  /** Decoded image: interleaved RGB, `pixels.length == width*height*3`. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    def channels: Int = 3
  }

  /** Encode interleaved RGB into a P6 blob. */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != ${width}x$height x3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Header length for given dims — the geometry half of the blob-size
    * contract (`blobSize = headerLen + w*h*3`), mirrored by the SQL
    * oracle as `9 + len(str(w)) + len(str(h))`. */
  def headerLen(width: Int, height: Int): Int =
    3 + width.toString.length + 1 + height.toString.length + 1 + 4

  /** Decode a P6 blob. Throws IllegalArgumentException on anything that
    * is not a well-formed maxval-255 P6 — corrupt payloads must fail
    * loudly, not yield garbage dimensions. */
  def decode(blob: Array[Byte]): Image = {
    require(blob.length >= 2 && blob(0) == 'P' && blob(1) == '6',
      "not a P6 ppm (bad magic)")
    var pos = 2
    // header tokens may be separated by whitespace and '#' comments
    def nextInt(): Int = {
      while (pos < blob.length &&
             (isWs(blob(pos)) || blob(pos) == '#')) {
        if (blob(pos) == '#') // comment runs to end of line
          while (pos < blob.length && blob(pos) != '\n') pos += 1
        else pos += 1
      }
      require(pos < blob.length && blob(pos) >= '0' && blob(pos) <= '9',
        s"ppm header: expected integer at byte $pos")
      var v = 0
      while (pos < blob.length && blob(pos) >= '0' && blob(pos) <= '9') {
        v = v * 10 + (blob(pos) - '0')
        require(v > 0 && v <= (1 << 24), "ppm header: integer out of range")
        pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"only maxval 255 supported, got $maxval")
    // exactly ONE whitespace byte separates the header from the raster
    require(pos < blob.length && isWs(blob(pos)), "ppm header: missing raster separator")
    pos += 1
    val n = w * h * 3
    require(blob.length - pos == n,
      s"ppm raster: expected $n bytes for ${w}x$h, found ${blob.length - pos}")
    val pixels = new Array[Byte](n)
    System.arraycopy(blob, pos, pixels, 0, n)
    Image(w, h, pixels)
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  /** Area-average (box-filter) downscale of interleaved RGB — the
    * standard antialiasing resample for scale <= 1: each destination
    * pixel is the mean of its source box, so no source pixel is ever
    * skipped (nearest-neighbor aliases; this integrates). Integer box
    * edges `x0 = x*sw/dw` partition the source exactly. */
  def resizeArea(src: Array[Byte], sw: Int, sh: Int, dw: Int, dh: Int): Array[Byte] = {
    require(dw >= 1 && dh >= 1 && dw <= sw && dh <= sh,
      s"area resample is a downscale: ${sw}x$sh -> ${dw}x$dh")
    require(src.length == sw * sh * 3, "bad source buffer")
    val out = new Array[Byte](dw * dh * 3)
    var y = 0
    while (y < dh) {
      val y0 = y * sh / dh
      val y1 = math.max(y0 + 1, (y + 1) * sh / dh)
      var x = 0
      while (x < dw) {
        val x0 = x * sw / dw
        val x1 = math.max(x0 + 1, (x + 1) * sw / dw)
        var c = 0
        while (c < 3) {
          var sum = 0L
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) { sum += src((yy * sw + xx) * 3 + c) & 0xff; xx += 1 }
            yy += 1
          }
          out((y * dw + x) * 3 + c) =
            (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }
}
