package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The image path is REAL end-to-end as of round 5: payloads are P6 PPM
  * blobs ([[Ppm]] — a pure-JVM codec, no native libraries), the decode
  * parses the actual header and raster, and the resize is a true
  * area-average resample over the decoded pixels. The per-partition
  * `mapPartitions` placement is the production shape (the Scala analogue
  * of a mapInPandas batch UDF): a heavier codec (JPEG via JNI, a video
  * demuxer) would open its handle once per batch exactly where these
  * loops sit. Only the video frame path ([[sampleFrames]]) still treats
  * payloads as an opaque byte stream — container demuxing needs a format
  * this container doesn't ship — but its stride/slice geometry and
  * one-row-per-frame schema are the real plumbing.
  */
object BinaryColumns {

  case class Blob(doc_id: Long, payload: Array[Byte])
  case class BlobMeta(doc_id: Long, n_bytes: Long,
                      width: Long, height: Long, channels: Long)

  /** Manufacture a binary payload column from text (UTF-8 bytes) — stands
    * in for reading raw media bytes from object storage (video path). */
  def toBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload")).as[Blob]
  }

  /** Deterministic REAL image per document: a P6 PPM whose dimensions
    * derive from the text's byte length (w = 8 + n % 64, h = 8 + n % 48 —
    * the oracle computes the same) and whose RGB raster is the text's
    * bytes cycled to w*h*3. The 8-pixel floor keeps every image at
    * least one full aHash grid: a 1×1 image would hash to 0 no matter
    * its pixel (all cell means equal), so two distinct tiny docs could
    * merge into one phash class and break the mm_phash contract by
    * corpus-luck. Stands in for reading image files from object
    * storage; everything downstream decodes it for real. */
  def toImageBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    toBlobs(docs).map { b =>
      val n = b.payload.length
      val w = 8 + n % 64
      val h = 8 + n % 48
      val px = new Array[Byte](w * h * 3)
      if (n > 0) {
        var i = 0
        while (i < px.length) { px(i) = b.payload(i % n); i += 1 }
      }
      Blob(b.doc_id, Ppm.encode(w, h, px))
    }
  }

  /** Decode metadata per partition — a REAL header+raster parse
    * ([[Ppm.decode]]); malformed payloads throw rather than yielding
    * garbage dimensions. Decoder state would be amortized per batch
    * here if the codec carried any. */
  def decodeMeta(blobs: Dataset[Blob]): Dataset[BlobMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val img = Ppm.decode(b.payload)
        BlobMeta(b.doc_id, b.payload.length.toLong,
          img.width.toLong, img.height.toLong, img.channels.toLong)
      }
    }
  }

  /** End-to-end: text → PPM blob → per-partition real decode → typed
    * metadata frame. */
  def binaryMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(toImageBlobs(docs)).toDF().orderBy("doc_id")

  case class ResizedImage(doc_id: Long, src_w: Long, src_h: Long,
                          dst_w: Long, dst_h: Long, out_bytes: Long,
                          resized: Array[Byte])

  /** Image resize: aspect-preserving fit into a `maxW × maxH` box over
    * the DECODED dimensions — `scale = min(1, maxW/w, maxH/h)`,
    * `dst = max(1, floor(src * scale))`, never upscaled, written as the
    * same IEEE double expression the SQL oracle uses. The kernel is a
    * real area-average resample over the decoded raster
    * ([[Ppm.resizeArea]]); the output buffer is the resized interleaved
    * RGB (`dst_w * dst_h * 3` bytes). Per-partition mapPartitions is
    * where a heavier codec handle would open once per batch. */
  def resizeImages(blobs: Dataset[Blob], maxW: Int, maxH: Int): Dataset[ResizedImage] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val img = Ppm.decode(b.payload)
        val w = img.width; val h = img.height
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val dw = math.max(1L, math.floor(w * scale).toLong).toInt
        val dh = math.max(1L, math.floor(h * scale).toLong).toInt
        val out = Ppm.resizeArea(img.pixels, w, h, dw, dh)
        ResizedImage(b.doc_id, w.toLong, h.toLong, dw.toLong, dh.toLong,
          out.length.toLong, out)
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Long, offset: Long,
                   frame_bytes: Long, frame_hash: Long)

  /** Video-style frame sampling plumbing: slice each payload into
    * `nFrames` evenly-spaced fixed-size frames (offset stride =
    * payload/nFrames) and emit one typed row per frame, hashed for
    * downstream dedup. A real pipeline decodes the container and seeks
    * keyframes in the same per-partition loop; the stride math, explode
    * shape, and one-row-per-frame schema are the production plumbing.
    * Rows explode by a CONSTANT factor (nFrames), so the shuffle story
    * is unchanged — this is a projection+generate, no join, no agg. */
  def sampleFrames(blobs: Dataset[Blob], nFrames: Int, frameBytes: Int): Dataset[Frame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      // per-partition: a real codec/demuxer handle would open here
      it.flatMap { b =>
        val n = b.payload.length
        val stride = math.max(1L, n.toLong / nFrames)
        (0 until nFrames).iterator
          .map(i => (i.toLong, i * stride))
          .takeWhile(_._2 < n)
          .map { case (idx, off) =>
            val end = math.min(n.toLong, off + frameBytes).toInt
            // content hash of the frame span (stands in for pixel phash)
            var h = 1125899906842597L
            var p = off.toInt
            while (p < end) { h = h * 31 + b.payload(p); p += 1 }
            Frame(b.doc_id, idx, off, end - off, h)
          }
      }
    }
  }
}
