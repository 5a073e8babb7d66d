package graft.multimodal

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multi-format image container layer: PPM (P6) via the hand-rolled
  * [[Ppm]] parser, PNG and JPEG via the JDK's built-in ImageIO readers —
  * still zero external dependencies (javax.imageio ships with the JDK
  * and is headless-safe). Every decode lands in the same interleaved-RGB
  * [[Ppm.Image]], so aHash, the area resample, and all downstream
  * kernels are format-agnostic.
  *
  * The container is SNIFFED from magic bytes, never trusted from
  * metadata: `P6` → netpbm, the 8-byte 89-50-4e-47-0d-0a-1a-0a
  * signature → PNG, `FF D8 FF` → JPEG. Anything else throws — a
  * corrupt or mislabeled payload must fail loudly at the decode
  * site, matching the [[Ppm]] contract. */
object Codecs {

  val PpmFormat = "ppm"
  val PngFormat = "png"
  val JpgFormat = "jpg"

  // ImageIO's default path spools through a disk-backed cache file per
  // read/write — pure overhead for byte-array payloads, and a temp-file
  // leak hazard inside executor tasks. One-time JVM-wide switch-off.
  ImageIO.setUseCache(false)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Identify the container from magic bytes; throws on anything
    * unrecognized. */
  def sniff(blob: Array[Byte]): String =
    if (blob.length >= 2 && blob(0) == 'P' && blob(1) == '6') PpmFormat
    else if (blob.length >= 8 && PngSig.indices.forall(i => blob(i) == PngSig(i))) PngFormat
    else if (blob.length >= 3 && blob(0) == 0xff.toByte &&
             blob(1) == 0xd8.toByte && blob(2) == 0xff.toByte) JpgFormat
    else throw new IllegalArgumentException(
      s"unrecognized image container (${blob.length} bytes; " +
        s"first=${blob.take(4).map(b => f"${b & 0xff}%02x").mkString(" ")})")

  /** Decode any supported container to interleaved RGB. One-shot entry:
    * looks an ImageIO reader up per call. Batch decode loops (the
    * mapPartitions sites) should go through a per-partition [[Handle]]
    * instead, which reuses reader/writer instances across rows. */
  def decode(blob: Array[Byte]): Ppm.Image = sniff(blob) match {
    case PpmFormat => Ppm.decode(blob)
    case _         => imageIoDecode(blob)
  }

  /** Per-partition reusable ImageIO state. `ImageIO.read`/`write` walk
    * the IIORegistry SPI lookup and allocate a fresh reader/writer per
    * call; at one call per ROW that lookup (plus the discarded
    * reader's setup) is pure churn — measured as warm-pass variance in
    * mm_resize at local[32]. One Handle per partition caches one
    * reader and one writer per format and reuses them across the whole
    * batch, the same amortization a real video/image codec handle needs.
    * NOT thread-safe — Spark runs one task per partition, which is the
    * contract. */
  final class Handle {
    private val readers = scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
    private val writers = scala.collection.mutable.Map.empty[String, javax.imageio.ImageWriter]

    private def ioName(fmt: String): String =
      if (fmt == PngFormat) "png" else "jpeg"

    def decode(blob: Array[Byte]): Ppm.Image = sniff(blob) match {
      case PpmFormat => Ppm.decode(blob)
      case fmt =>
        val r = readers.getOrElseUpdate(fmt, {
          val it = ImageIO.getImageReadersByFormatName(ioName(fmt))
          require(it.hasNext, s"ImageIO has no reader for $fmt")
          it.next()
        })
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
        try {
          r.setInput(iis, true, true)
          toRgb(r.read(0))
        } finally {
          r.setInput(null)
          iis.close()
        }
    }

    def encode(format: String, img: Ppm.Image): Array[Byte] = format match {
      case PpmFormat => Ppm.encode(img.width, img.height, img.pixels)
      case PngFormat | JpgFormat =>
        val w = writers.getOrElseUpdate(format, {
          val it = ImageIO.getImageWritersByFormatName(ioName(format))
          require(it.hasNext, s"ImageIO has no writer for $format")
          it.next()
        })
        val out = new ByteArrayOutputStream(img.pixels.length / 4 + 64)
        val ios = ImageIO.createImageOutputStream(out)
        try {
          w.setOutput(ios)
          w.write(toBgrBuffered(img))
        } finally {
          w.setOutput(null)
          ios.close()
        }
        out.toByteArray
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }

    /** Release native/reader state at end of partition (optional — the
      * handles are plain heap objects otherwise). */
    def dispose(): Unit = {
      readers.values.foreach(_.dispose()); readers.clear()
      writers.values.foreach(_.dispose()); writers.clear()
    }
  }

  private def imageIoDecode(blob: Array[Byte]): Ppm.Image = {
    val bi = ImageIO.read(new ByteArrayInputStream(blob))
    require(bi != null, "ImageIO found no reader for a sniffed PNG/JPEG payload")
    toRgb(bi)
  }

  /** Normalize ANY source color model (gray, indexed, ARGB, YCbCr...)
    * through one bulk raster grab of a 3BYTE_BGR copy, then swap to RGB. */
  private def toRgb(bi: BufferedImage): Ppm.Image = {
    val w = bi.getWidth; val h = bi.getHeight
    val conv =
      if (bi.getType == BufferedImage.TYPE_3BYTE_BGR) bi
      else {
        val c = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        val g = c.createGraphics()
        g.drawImage(bi, 0, 0, null)
        g.dispose()
        c
      }
    val bgr = conv.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      px(3 * i) = bgr(3 * i + 2)
      px(3 * i + 1) = bgr(3 * i + 1)
      px(3 * i + 2) = bgr(3 * i)
      i += 1
    }
    Ppm.Image(w, h, px)
  }

  /** Interleaved RGB → a 3BYTE_BGR BufferedImage (the encode input). */
  private def toBgrBuffered(img: Ppm.Image): BufferedImage = {
    val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_3BYTE_BGR)
    val bgr = bi.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    var i = 0
    while (i < img.width * img.height) {
      bgr(3 * i) = img.pixels(3 * i + 2)
      bgr(3 * i + 1) = img.pixels(3 * i + 1)
      bgr(3 * i + 2) = img.pixels(3 * i)
      i += 1
    }
    bi
  }

  /** Encode interleaved RGB into the named container. PPM and PNG are
    * lossless (decode(encode(img)) == img bit-for-bit); JPEG is lossy
    * but deterministic — the same pixels always yield the same blob,
    * which is what content-keyed dedup contracts rely on. */
  def encode(format: String, img: Ppm.Image): Array[Byte] = format match {
    case PpmFormat => Ppm.encode(img.width, img.height, img.pixels)
    case PngFormat => imageIoEncode("png", img)
    case JpgFormat => imageIoEncode("jpg", img)
    case other     => throw new IllegalArgumentException(s"unknown format $other")
  }

  private def imageIoEncode(ioName: String, img: Ppm.Image): Array[Byte] = {
    val out = new ByteArrayOutputStream(img.pixels.length / 4 + 64)
    val ok = ImageIO.write(toBgrBuffered(img), ioName, out)
    require(ok, s"ImageIO has no writer for $ioName")
    out.toByteArray
  }

  /** Per-format container-integrity check against the DECODED image —
    * the structural facts each container guarantees, verified from the
    * raw bytes rather than trusted from the decoder:
    *  - ppm: the exact blob-size law, `len == headerLen(w,h) + w*h*3`
    *  - png: IHDR width/height (big-endian at fixed offsets 16/20 —
    *    IHDR is required to be the first chunk) match the decoded dims,
    *    and the stream ends with an IEND chunk
    *  - jpg: starts with SOI and ends with EOI markers
    */
  def containerOk(blob: Array[Byte], img: Ppm.Image): Boolean = sniff(blob) match {
    case PpmFormat =>
      blob.length == Ppm.headerLen(img.width, img.height) + img.width * img.height * 3
    case PngFormat =>
      blob.length >= 33 &&
        beInt(blob, 16) == img.width && beInt(blob, 20) == img.height &&
        new String(blob, blob.length - 8, 4, "US-ASCII") == "IEND"
    case JpgFormat =>
      blob.length >= 4 &&
        blob(blob.length - 2) == 0xff.toByte && blob(blob.length - 1) == 0xd9.toByte
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
}
