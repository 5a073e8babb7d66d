package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The decode step is a STUB (this container has no image/audio codecs):
  * `StubDecoder.decode` derives deterministic fake metadata from the raw
  * bytes. The Spark-side plumbing is real — typed Encoders, per-partition
  * batch processing via mapPartitions (the Scala analogue of mapInPandas:
  * the decoder is instantiated once per partition, amortized over the
  * batch, exactly where a JNI/codec handle would live), and a schema that
  * survives a parquet round-trip.
  */
object BinaryColumns {

  case class Blob(doc_id: Long, payload: Array[Byte])
  case class BlobMeta(doc_id: Long, n_bytes: Long,
                      width: Long, height: Long, channels: Long)

  /** A real decoder would parse image headers / decode frames here. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      val n = payload.length.toLong
      // ??? real codec goes here — deterministic fake keeps tests honest
      (1 + n % 64, 1 + n % 48, 3L)
    }
  }

  /** Manufacture a binary payload column from text (UTF-8 bytes) — stands
    * in for reading image bytes from object storage. */
  def toBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload")).as[Blob]
  }

  /** Decode metadata per partition (decoder init amortized per batch). */
  def decodeMeta(blobs: Dataset[Blob]): Dataset[BlobMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      // per-partition decoder setup would happen here
      it.map { b =>
        val (w, h, c) = StubDecoder.decode(b.payload)
        BlobMeta(b.doc_id, b.payload.length.toLong, w, h, c)
      }
    }
  }

  /** End-to-end: text → binary → per-partition stub decode → typed
    * metadata frame. */
  def binaryMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(toBlobs(docs)).toDF().orderBy("doc_id")

  case class ResizedImage(doc_id: Long, src_w: Long, src_h: Long,
                          dst_w: Long, dst_h: Long, out_bytes: Long,
                          resized: Array[Byte])

  /** Image-resize plumbing: aspect-preserving fit into a `maxW × maxH`
    * box. The GEOMETRY is real — `scale = min(1, maxW/w, maxH/h)`,
    * `dst = max(1, floor(src * scale))`, never upscaled — and written as
    * the same IEEE double expression the SQL oracle uses, so both sides
    * agree bit-for-bit. The pixel kernel is the stub (no codec in this
    * container): it emits a `dst_w*dst_h`-byte buffer cyclically sampled
    * from the payload, honest about output SIZE so downstream batching /
    * memory math is exercised for real. Per-partition mapPartitions is
    * where a real resampler handle would open once per batch — the
    * Scala analogue of a mapInPandas batch UDF. */
  def resizeImages(blobs: Dataset[Blob], maxW: Int, maxH: Int): Dataset[ResizedImage] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      // per-partition: codec + resample kernel handle opens here
      it.map { b =>
        val (w, h, _) = StubDecoder.decode(b.payload)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val dw = math.max(1L, math.floor(w * scale).toLong)
        val dh = math.max(1L, math.floor(h * scale).toLong)
        // ??? real resample goes here — stub fills the correctly-sized
        // buffer by cyclic sampling so output size/schema stay honest
        val out = new Array[Byte]((dw * dh).toInt)
        if (b.payload.nonEmpty) {
          var i = 0
          while (i < out.length) { out(i) = b.payload(i % b.payload.length); i += 1 }
        }
        ResizedImage(b.doc_id, w, h, dw, dh, out.length.toLong, out)
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
            // stub "decode": hash the frame span (stands in for pixels)
            var h = 1125899906842597L
            var p = off.toInt
            while (p < end) { h = h * 31 + b.payload(p); p += 1 }
            Frame(b.doc_id, idx, off, end - off, h)
          }
      }
    }
  }
}
