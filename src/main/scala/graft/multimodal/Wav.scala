package graft.multimodal

/** Audio-container layer: RIFF/WAVE PCM16. Pure JVM, zero external
  * dependencies — the audio analogue of [[Ppm]]/[[Codecs]] for images.
  *
  * The synthetic corpus carries no real audio, so blobs are SYNTHESIZED
  * deterministically from each document's byte length (an integer-law
  * LCG-ish sample stream the SQL oracle reproduces bit-exactly), but the
  * Spark-side pipeline is real end-to-end: a byte-accurate 44-byte
  * RIFF/fmt/data header is written, then PARSED back (magic-checked,
  * little-endian field decode — nothing trusted from the synthesis), and
  * the features (RMS, peak, zero-crossing rate) are computed from the
  * decoded PCM bytes, not from the generating formula. Swapping the
  * synthesizer for file-sourced bytes changes nothing downstream —
  * the parse/feature path only sees a blob.
  *
  * All sample arithmetic is integer (Long) so the DuckDB oracle matches
  * exactly: sum of squares stays in BIGINT range (32768² · n_samples ≪
  * 2⁶³), and the only floating point is one division + sqrt (both
  * correctly rounded IEEE on either engine).
  */
object Wav {

  /** Deterministic synthesis law, shared verbatim with the SQL oracle:
    * rate cycles 8k/16k/44.1k on byte-length mod 3; sample count is
    * bounded 256..1279; samples are a 16-bit residue stream from a
    * multiplicative recurrence seeded on the byte length. */
  def rateFor(nBytes: Long): Int = (nBytes % 3) match {
    case 0 => 8000
    case 1 => 16000
    case _ => 44100
  }
  def samplesFor(nBytes: Long): Int = (256 + (nBytes * 7) % 1024).toInt
  def seedFor(nBytes: Long): Long = (nBytes * 2654435761L) % 2147483647L
  def sampleAt(seed: Long, i: Int): Int =
    (((seed + (i + 1).toLong * 48271L) % 65536L) - 32768L).toInt

  /** Synthesize the PCM16 mono WAV blob for a document payload. */
  def synth(payload: Array[Byte]): Array[Byte] = {
    val b = payload.length.toLong
    val rate = rateFor(b)
    val n = samplesFor(b)
    val seed = seedFor(b)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = sampleAt(seed, i)
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    encode(rate, data)
  }

  /** Standard 44-byte PCM16-mono WAV header + data chunk. */
  def encode(sampleRate: Int, pcm: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1)                     // PCM
    out.putShort(1)                     // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2)          // byte rate
    out.putShort(2)                     // block align
    out.putShort(16)                    // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(pcm.length)
    out.put(pcm)
    out.array()
  }

  final case class Parsed(sampleRate: Int, channels: Int, bits: Int,
                          dataOffset: Int, dataBytes: Int, headerOk: Boolean)

  /** Parse the RIFF/WAVE container from raw bytes. Walks chunks (fmt
    * may be followed by others before data), checks magic strings and
    * size laws; throws on a non-WAV payload, flags structural lies in
    * `headerOk` rather than trusting any field. */
  def parse(blob: Array[Byte]): Parsed = {
    val buf = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, len: Int) = new String(blob, off, len, "US-ASCII")
    require(blob.length >= 44 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
      s"not a RIFF/WAVE payload (${blob.length} bytes)")
    val riffSize = buf.getInt(4)
    var off = 12
    var rate = 0; var ch = 0; var bits = 0
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= blob.length && (dataOff < 0 || rate == 0)) {
      val id = ascii(off, 4); val len = buf.getInt(off + 4)
      id match {
        case "fmt " =>
          rate = buf.getInt(off + 12)
          ch = buf.getShort(off + 10).toInt
          bits = buf.getShort(off + 22).toInt
        case "data" => dataOff = off + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(dataOff >= 0 && rate > 0, "WAV missing fmt or data chunk")
    val ok = riffSize == blob.length - 8 &&
      dataOff + dataLen <= blob.length && dataLen % 2 == 0
    Parsed(rate, ch, bits, dataOff, dataLen, ok)
  }

  final case class Features(nSamples: Long, durationMs: Long, rms: Double,
                            peak: Long, zcr: Double)

  /** One pass over the decoded PCM16 stream: RMS (integer sum of
    * squares, one final division + sqrt), peak |amplitude|, and
    * zero-crossing rate (strict sign product < 0, so zeros never
    * count). */
  def features(blob: Array[Byte], p: Parsed): Features = {
    val n = p.dataBytes / 2
    var sumSq = 0L; var peak = 0L; var zc = 0L
    var prev = 0; var i = 0
    while (i < n) {
      val lo = blob(p.dataOffset + 2 * i) & 0xff
      val hi = blob(p.dataOffset + 2 * i + 1).toInt
      val v = (hi << 8) | lo
      sumSq += v.toLong * v
      val a = math.abs(v.toLong); if (a > peak) peak = a
      if (i > 0 && v.toLong * prev < 0) zc += 1
      prev = v
      i += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
    val zcr = if (n <= 1) 0.0 else zc.toDouble / (n - 1)
    Features(n.toLong, n.toLong * 1000L / p.sampleRate, rms, peak.toLong, zcr)
  }
}
