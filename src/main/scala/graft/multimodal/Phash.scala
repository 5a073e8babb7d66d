package graft.multimodal

/** Perceptual image hashing (aHash / average hash) over DECODED pixels —
  * the image-side analogue of the text fingerprints: a 64-bit signature
  * that is a pure function of image CONTENT (identical images hash
  * identically regardless of how their bytes arrived), cheap enough to
  * compute in the ingest pass, and hamming-bandable for near-dup search
  * exactly like SimHash (the banding machinery in graft.dedup applies
  * unchanged).
  *
  * aHash: luminance-average the image onto an 8×8 grid, then emit one
  * bit per cell — 1 where the cell is brighter than the grid mean. Grid
  * cells partition the raster with the same integer box edges as
  * [[Ppm.resizeArea]], so every source pixel contributes. Images
  * smaller than 8×8 repeat pixels across cells (the grid is then a
  * nearest-neighbor upsample), keeping the hash total on any input. */
object Phash {

  /** 64-bit average hash of a decoded image. Bit `8*gy + gx` is set iff
    * grid cell (gx, gy)'s mean luminance exceeds the whole-grid mean. */
  def aHash64(img: Ppm.Image): Long = {
    val w = img.width; val h = img.height; val px = img.pixels
    val cell = new Array[Double](64)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8
      val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 8
        val x1 = math.max(x0 + 1, (gx + 1) * w / 8)
        var sum = 0L
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val i = (yy * w + xx) * 3
            sum += (px(i) & 0xff) + (px(i + 1) & 0xff) + (px(i + 2) & 0xff)
            xx += 1
          }
          yy += 1
        }
        cell(gy * 8 + gx) =
          sum.toDouble / ((y1 - y0).toLong * (x1 - x0) * 3)
        gx += 1
      }
      gy += 1
    }
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += cell(i); i += 1 }
    mean /= 64
    var bits = 0L
    i = 0
    while (i < 64) { if (cell(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Hamming distance between two 64-bit perceptual hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
