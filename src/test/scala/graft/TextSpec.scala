package graft

import org.apache.spark.sql.functions._

import graft.multimodal.BinaryColumns
import graft.text.TextOps

class TextSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf)

  test("langid predicts a language for every doc, scores consistent") {
    val l = TextOps.langId(docs).cache()
    assert(l.filter(col("lang_pred").isNull).count() == 0)
    // when predicted 'en', en-score must be the max
    val bad = l.filter(col("lang_pred") === "en" &&
      (col("score_en") < col("score_es") || col("score_en") < col("score_fr"))).count()
    assert(bad == 0)
    l.unpersist()
  }

  test("quality features are in range") {
    val q = TextOps.qualityScore(docs)
    assert(q.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    assert(q.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("token counts: BPE-ish regex tokens >= tokenizer tokens") {
    // every tokenizer token is >= 1 BPE-ish piece (letter runs / digit
    // runs split further, never merge), so the inequality is a law
    val t = TextOps.tokenCounts(docs)
    assert(t.filter(col("n_re_tokens") < col("n_tokens")).count() == 0)
  }

  test("repetition features flag a boilerplate doc and clear a clean one") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight distinct words make one clean doc")).toDF("doc_id", "text")
    val r = TextOps.repetition(d).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) > 0.8, s"boilerplate dup_3gram_frac ${r(1L)} too low")
    assert(r(2L) == 0.0, s"clean doc dup_3gram_frac ${r(2L)} nonzero")
  }

  test("contamination marks the benchmark docs themselves and their dups") {
    val scored = TextOps.contamination(docs, docs.filter(col("doc_id") < 3), n = 8)
    val selfHits = scored.filter(col("doc_id") < 3 && !col("contaminated")).count()
    assert(selfHits == 0, "benchmark members must self-contaminate")
    assert(scored.count() == docs.count(), "every doc gets a verdict")
  }

  test("native word_ngrams matches the declarative shingle expression") {
    val native = TextOps.withShingles(docs, "text", 3).select("doc_id", "shingles")
    val legacy = docs
      .withColumn("_toks", split(lower(col("text")), " "))
      .withColumn("shingles", TextOps.shingleExpr("_toks", 3))
      .select("doc_id", "shingles")
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val l = legacy.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(n == l, "shingle arrays (values AND order) must be identical")
    // short-doc edge: fewer tokens than n collapses to the full span
    import spark.implicits._
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(TextOps.withShingles(short, "text", 3)
      .select("shingles").collect()(0).getSeq[String](0) == Seq("a b"))
  }

  test("native rolling/token-min hash expressions match the declarative forms") {
    val native = TextOps.rollingFingerprint(docs)
      .select("doc_id", "rolling_hash", "winnow_min")
    val legacy = docs
      .withColumn("rolling_hash", expr(
        "aggregate(regexp_extract_all(text, '.', 0), cast(7 as bigint), " +
        "(acc, c) -> pmod(acc * 131 + ascii(c), 1000000007))"))
      .withColumn("_hashes", expr("transform(split(lower(text), ' '), t -> xxhash64(t))"))
      .withColumn("winnow_min", expr(
        "array_min(transform(sequence(0, greatest(size(_hashes) - 8, 0)), " +
        "i -> array_min(slice(_hashes, i + 1, 8))))"))
      .select("doc_id", "rolling_hash", "winnow_min")
    assert(native.except(legacy).count() == 0 && legacy.except(native).count() == 0)
  }

  test("GraftExtensions exposes the native functions to plain SQL") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force-init the shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val row = s2.sql(
        """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
          |       simhash64(array('a', 'b')) AS sh,
          |       rolling_hash('abc') AS rh,
          |       token_min_hash('a b') AS tm""".stripMargin).collect()(0)
      assert(row.getDouble(0) == 1.0)
      assert(!row.isNullAt(1) && !row.isNullAt(2) && !row.isNullAt(3))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("frame sampling: stride geometry and per-frame determinism") {
    val frames = BinaryColumns.sampleFrames(
      BinaryColumns.toBlobs(docs.limit(20)), nFrames = 4, frameBytes = 16).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.doc_id).foreach { case (_, fs) =>
      assert(fs.length <= 4)
      assert(fs.map(_.frame_idx).sorted.sameElements(fs.indices.map(_.toLong)))
      assert(fs.forall(f => f.frame_bytes > 0 && f.frame_bytes <= 16))
    }
    val again = BinaryColumns.sampleFrames(
      BinaryColumns.toBlobs(docs.limit(20)), 4, 16).collect()
    assert(frames.map(f => (f.doc_id, f.frame_idx, f.frame_hash)).toSet ==
      again.map(f => (f.doc_id, f.frame_idx, f.frame_hash)).toSet)
  }

  test("resize: real area resample, aspect preserved, never upscaled, RGB buffer") {
    val rs = BinaryColumns.resizeImages(
      BinaryColumns.toImageBlobs(docs.limit(50)), maxW = 32, maxH = 32).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.dst_w <= 32 && r.dst_h <= 32, "must fit the box")
      assert(r.dst_w <= r.src_w && r.dst_h <= r.src_h, "never upscale")
      assert(r.resized.length.toLong == r.dst_w * r.dst_h * 3,
        "interleaved RGB output buffer")
      // within-box inputs pass through unscaled
      if (r.src_w <= 32 && r.src_h <= 32)
        assert(r.dst_w == r.src_w && r.dst_h == r.src_h)
      // aspect ratio preserved up to floor rounding
      if (r.src_w > 32 || r.src_h > 32) {
        val sc = math.min(32.0 / r.src_w, 32.0 / r.src_h)
        assert(r.dst_w == math.max(1L, math.floor(r.src_w * sc).toLong))
        assert(r.dst_h == math.max(1L, math.floor(r.src_h * sc).toLong))
      }
    }
  }

  test("binary plumbing: mixed-container metadata survives parquet round-trip") {
    val meta = BinaryColumns.binaryMeta(spark, docs)
    val path = java.nio.file.Files.createTempDirectory("graft_mm").toString
    meta.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count())
    assert(back.schema("raster_bytes").dataType.typeName == "long")
    // decoded geometry is container-independent: raster = w*h*3 always
    assert(back.filter(col("raster_bytes") =!=
      col("width") * col("height") * 3).count() == 0)
    assert(back.filter(col("channels") =!= 3).count() == 0)
    // every container passed its structural integrity check
    assert(back.filter(!col("container_ok")).count() == 0)
    // format is keyed on text byte length % 3 — all formats that the
    // corpus's length distribution selects must actually appear
    import spark.implicits._
    val expected = docs.select(col("doc_id"),
        (length(col("text").cast("binary")) % 3).as("m"))
      .withColumn("format",
        when(col("m") === 0, "ppm").when(col("m") === 1, "png").otherwise("jpg"))
      .select("doc_id", "format")
    assert(back.select("doc_id", "format").except(expected).count() == 0)
    assert(expected.except(back.select("doc_id", "format")).count() == 0)
  }

  test("codecs: png round-trips pixels exactly; jpeg preserves geometry and is deterministic") {
    import graft.multimodal.{Codecs, Ppm}
    // 3x2 RGB with distinct known pixels
    val px = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,   0, 0, 255.toByte,
      255.toByte, 255.toByte, 255.toByte,   0, 0, 0,   128.toByte, 64, 32)
    val src = Ppm.Image(3, 2, px)
    val png = Codecs.encode("png", src)
    assert(Codecs.sniff(png) == "png")
    val backPng = Codecs.decode(png)
    assert(backPng.width == 3 && backPng.height == 2)
    // PNG is lossless: decoded pixels are bit-identical to the source
    assert(backPng.pixels.sameElements(px))
    assert(Codecs.containerOk(png, backPng))

    val jpg = Codecs.encode("jpg", src)
    assert(Codecs.sniff(jpg) == "jpg")
    val backJpg = Codecs.decode(jpg)
    // JPEG is lossy but geometry-exact and deterministic
    assert(backJpg.width == 3 && backJpg.height == 2)
    assert(Codecs.containerOk(jpg, backJpg))
    assert(Codecs.encode("jpg", src).sameElements(jpg), "jpeg encode must be deterministic")
    assert(Codecs.decode(jpg).pixels.sameElements(backJpg.pixels),
      "jpeg decode must be deterministic")
    // lossy, not garbage: per-channel error bounded on a smooth check
    val flat = Ppm.Image(16, 16, Array.fill(16 * 16 * 3)(100.toByte))
    val flatBack = Codecs.decode(Codecs.encode("jpg", flat))
    val maxErr = flatBack.pixels.zip(flat.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 8, s"flat-field jpeg error $maxErr")

    // ppm dispatches through the same sniff
    val ppm = Codecs.encode("ppm", src)
    assert(Codecs.sniff(ppm) == "ppm" && Codecs.decode(ppm).pixels.sameElements(px))
    assert(Codecs.containerOk(ppm, src))
    // unknown containers fail loudly at the sniff
    intercept[IllegalArgumentException](Codecs.decode("GIF89a whatever".getBytes))
    // structural damage is caught: IHDR dims that disagree with decode
    val sizeLie = png.clone(); sizeLie(19) = 9 // IHDR width low byte: 3 -> 9
    assert(!Codecs.containerOk(sizeLie, backPng))
    val noEoi = jpg.dropRight(2)
    assert(!Codecs.containerOk(noEoi, backJpg))
  }

  test("codecs: any imageio color model normalizes to interleaved 3-channel rgb") {
    import graft.multimodal.Codecs
    // grayscale PNG written by ImageIO directly (not our encoder) — the
    // decode path must normalize it to 3 channels with r==g==b
    val bi = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4)
      bi.getRaster.setSample(x, y, 0, (x * 4 + y) * 16)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val img = Codecs.decode(bos.toByteArray)
    assert(img.width == 4 && img.height == 4 && img.channels == 3)
    for (i <- 0 until 16) {
      assert(img.pixels(3 * i) == img.pixels(3 * i + 1) &&
             img.pixels(3 * i + 1) == img.pixels(3 * i + 2))
    }
  }

  test("phash: identical content collides across the mixed-container corpus") {
    import spark.implicits._
    import graft.multimodal.{BinaryColumns => BC, Codecs, Phash}
    // duplicate texts with lengths hitting each container (n%3 = 0,1,2)
    val texts = Seq("aaa", "bbbb", "ccccc").flatMap(t => Seq(t, t))
    val dup = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hashed = BC.toMixedImageBlobs(dup).map { b =>
      (b.doc_id, Codecs.sniff(b.payload), Phash.aHash64(Codecs.decode(b.payload)))
    }.collect().sortBy(_._1)
    assert(hashed.map(_._2).distinct.sorted.sameElements(Array("jpg", "png", "ppm")))
    // identical text => identical blob => identical phash, per container
    assert(hashed.grouped(2).forall { case Array(a, b) => a._3 == b._3 })
  }

  test("ppm codec: encode/decode round-trip and known pixel values") {
    import graft.multimodal.Ppm
    // 2x2 RGB: red, green, blue, white
    val px = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val blob = Ppm.encode(2, 2, px)
    assert(new String(blob.take(Ppm.headerLen(2, 2)), "US-ASCII") == "P6\n2 2\n255\n")
    val img = Ppm.decode(blob)
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    assert(img.pixels.sameElements(px))
    // header variations the netpbm spec allows: comments, extra whitespace
    val weird = ("P6 # a comment\n  2\t2 # dims\n 255\n").getBytes("US-ASCII") ++ px
    val img2 = Ppm.decode(weird)
    assert(img2.width == 2 && img2.height == 2 && img2.pixels.sameElements(px))
    // corrupt payloads fail loudly, never yield garbage dims
    intercept[IllegalArgumentException](Ppm.decode("not an image".getBytes))
    intercept[IllegalArgumentException](Ppm.decode(blob.dropRight(1)))
  }

  test("phash: pure function of pixels, brightness geometry sets the right bits") {
    import graft.multimodal.{Phash, Ppm}
    // 8x8 image, left half black, right half white: bit 8*gy+gx set
    // exactly where gx >= 4
    val px = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 4 until 8; c <- 0 until 3)
      px((y * 8 + x) * 3 + c) = 255.toByte
    val h = Phash.aHash64(Ppm.Image(8, 8, px))
    val expected = (for (gy <- 0 until 8; gx <- 4 until 8)
      yield 1L << (gy * 8 + gx)).reduce(_ | _)
    assert(h == expected, s"got ${h.toBinaryString}")
    // pure function: same pixels, same hash; single-pixel change moves it
    assert(Phash.aHash64(Ppm.Image(8, 8, px.clone())) == h)
    val px2 = px.clone(); px2(0) = 200.toByte; px2(1) = 200.toByte; px2(2) = 200.toByte
    assert(Phash.hamming(h, Phash.aHash64(Ppm.Image(8, 8, px2))) > 0)
    assert(Phash.hamming(h, h) == 0)
    // tiny images (grid upsamples) still hash totally and deterministically
    val tiny = Phash.aHash64(Ppm.Image(2, 1, Array[Byte](10, 10, 10, 90, 90, 90)))
    assert(tiny == Phash.aHash64(Ppm.Image(2, 1, Array[Byte](10, 10, 10, 90, 90, 90))))
  }

  test("packing: distributed prefix sum equals single-window pack; no doc splits") {
    import graft.text.Packing
    val packed = Packing.packByTokenBudget(docs, budget = 500L, bucketSize = 64L).cache()
    // exact reference: global single-partition window (test-only)
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val refShards = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tk"))
      .withColumn("before", coalesce(sum("tk").over(w), lit(0L)))
      .select(col("doc_id"), expr("before div 500").as("shard_id"))
    assert(packed.select("doc_id", "shard_id")
      .exceptAll(refShards.select("doc_id", "shard_id")).isEmpty,
      "bucketed prefix sum must equal the global window assignment")
    // shards are contiguous doc_id ranges (a doc never splits, order stable)
    val byShard = packed.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    byShard.sliding(2).foreach {
      case Array((_, s1), (_, s2)) => assert(s2 >= s1, "shard ids non-decreasing")
      case _ =>
    }
    // deterministic under repartitioning
    val again = Packing.packByTokenBudget(docs.repartition(13), 500L, 64L)
    assert(packed.select("doc_id", "shard_id")
      .exceptAll(again.select("doc_id", "shard_id")).isEmpty)
  }

  test("ppm area resample: 2x2 -> 1x1 is the exact per-channel mean") {
    import graft.multimodal.Ppm
    val px = Array[Byte](
      100, 0, 0,   0, 100, 0,
      0, 0, 100,   100, 100, 100)
    val out = Ppm.resizeArea(px, 2, 2, 1, 1)
    // each channel: (100 + 0 + 0 + 100) / 4 = 50
    assert(out.sameElements(Array[Byte](50, 50, 50)), out.mkString(","))
    // 4x2 -> 2x1: left box avgs pixels 0,1,4,5; right box 2,3,6,7
    val px2 = (0 until 4 * 2 * 3).map(i => (i * 2).toByte).toArray
    val out2 = Ppm.resizeArea(px2, 4, 2, 2, 1)
    def boxAvg(cols: Seq[Int], c: Int): Byte = {
      val vals = for (y <- 0 until 2; x <- cols) yield px2((y * 4 + x) * 3 + c) & 0xff
      (vals.sum / vals.size).toByte
    }
    assert(out2.sameElements(
      (0 until 3).map(c => boxAvg(Seq(0, 1), c)).toArray ++
      (0 until 3).map(c => boxAvg(Seq(2, 3), c))))
  }
}
