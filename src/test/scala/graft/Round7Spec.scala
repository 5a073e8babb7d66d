package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Wav

/** Round-7 operators: last-touch attribution, cross-doc span dedup,
  * and the WAV audio layer. Edge semantics pinned on constructed data
  * (the sf oracles check corpus-level agreement; these check the laws). */
class Round7Spec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_r7").toString

  // ---------------------------------------------------------- attribution

  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = tmp()
    rows.toDF("user_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("event_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("attribution: strictly-before, lookback, and unattributed cases") {
    val s = 1000000L // 1 second in µs
    val day = 86400L * 1000000L
    val dir = eventsDir(Seq(
      // user 1: click then purchase 100 s later -> attributed
      (1L, 100 * s, "click", 0.0), (1L, 200 * s, "purchase", 10.0),
      // user 2: purchase BEFORE its click -> not attributed
      (2L, 100 * s, "purchase", 20.0), (2L, 200 * s, "click", 0.0),
      // user 3: click at the SAME µs as the purchase -> strictness: not attributed
      (3L, 300 * s, "click", 0.0), (3L, 300 * s, "purchase", 40.0),
      // user 4: click 8 days before purchase -> outside 7-day lookback
      (4L, 0L, "click", 0.0), (4L, 8 * day, "purchase", 80.0),
      // user 5: two clicks; LAST one attributes, latency 50 s
      (5L, 100 * s, "click", 0.0), (5L, 250 * s, "click", 0.0),
      (5L, 300 * s, "purchase", 5.5)))
    val r = analytics.Queries.eventsAttribution(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_purchases") == 5)
    assert(r.getAs[Long]("n_attributed") == 2)        // users 1 and 5
    assert(r.getAs[Double]("attributed_value") == 15.5)
    assert(r.getAs[Double]("avg_latency_sec") == 75.0) // (100 + 50) / 2
  }

  // ---------------------------------------------------------- span dedup

  test("span dedup: cross-doc vs within-doc repeats, short docs excluded") {
    import spark.implicits._
    val dir = tmp()
    val shared = "a b c d e f g h" // exactly one 8-word span
    Seq(
      (1L, shared),                      // span X
      (2L, s"zz $shared"),               // contains span X (cross-doc with 1)
      (3L, "one two three"),             // < 8 words: no spans
      (4L, "p q r s t u v w p q r s t u v w")) // within-doc repeat only
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = analytics.Queries.textSpanDedup(spark, dir).collect()(0)
    // doc1: 1 span; doc2: 2 spans (X at pos 2, plus "zz a..g"); doc4: 9 spans
    assert(r.getAs[Long]("n_span_instances") == 12)
    // doc4's wrap-around span "p q r s t u v w" occurs at pos 1 and 9 ->
    // one distinct hash with n_occ 2 but n_docs 1 (NOT cross-doc)
    assert(r.getAs[Long]("n_cross_doc_spans") == 1)   // only span X
    assert(r.getAs[Long]("max_span_doc_freq") == 2)
    // distinct: X + "zz a..g" + doc4's 8 rotations (one repeated) = 10
    assert(r.getAs[Long]("n_distinct_spans") == 10)
  }

  // ---------------------------------------------------------- overlap

  test("corpus overlap: span-level jaccard between sources, hand-computed") {
    import spark.implicits._
    val dir = tmp()
    Seq(
      (1L, "A", "a b c d e f g h x"),   // spans: [a..h], [b..x] -> 2
      (2L, "B", "z a b c d e f g h"),   // spans: [z..g], [a..h] -> 2
      (3L, "C", "q r s t u v w y"))     // 1 span, disjoint
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = analytics.Queries.corpusOverlap(spark, dir).collect()
    assert(rows.length == 1) // only (A, B) share a span
    val r = rows(0)
    assert(r.getAs[String]("source_a") == "A" && r.getAs[String]("source_b") == "B")
    assert(r.getAs[Long]("n_shared") == 1 &&
      r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("jaccard") == 0.3333) // 1 / (2 + 2 - 1)
  }

  // ---------------------------------------------------------- retention

  test("retention: cohort by first day, exact-day offsets") {
    import spark.implicits._
    val dir = tmp()
    val d0 = java.time.LocalDate.parse("2024-01-01")
    def ts(day: Long, u: Long) =
      (u, java.sql.Timestamp.valueOf(d0.plusDays(day).atStartOfDay()))
    Seq(ts(0, 1), ts(1, 1), ts(7, 1),   // user 1: cohort d0, back on d1 and d7
        ts(0, 2),                        // user 2: cohort d0 only
        ts(2, 3), ts(3, 3), ts(32, 3))   // user 3: cohort d0+2, back next day (k=1), k=30
      .toDF("user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = analytics.Queries.eventsRetention(spark, dir).collect()
    assert(rows.length == 2)
    val r0 = rows(0) // cohort 2024-01-01: users 1,2
    assert(r0.getAs[Long]("n_users") == 2 &&
      r0.getAs[Long]("retained_d1") == 1 && r0.getAs[Long]("retained_d7") == 1 &&
      r0.getAs[Long]("retained_d14") == 0 && r0.getAs[Long]("retained_d30") == 0)
    val r1 = rows(1) // cohort 2024-01-03: user 3
    assert(r1.getAs[Long]("n_users") == 1 &&
      r1.getAs[Long]("retained_d1") == 1 && r1.getAs[Long]("retained_d30") == 1)
  }

  // ---------------------------------------------------------- histogram

  test("histogram: clamping at both ends, nulls dropped") {
    import spark.implicits._
    val dir = tmp()
    Seq(Some(-5.0), Some(0.0), Some(24.99), Some(25.0), Some(777.0), None)
      .zipWithIndex
      .map { case (v, i) => (i.toLong, v, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("event_id", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = analytics.Queries.aggHistogram(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
    assert(m == Map(0L -> 3L, 1L -> 1L, 20L -> 1L)) // null row dropped
  }

  // ---------------------------------------------------------- LM scoring

  test("lm score: hand-computed Laplace bigram log-probs, repetition scores higher") {
    import spark.implicits._
    val dir = tmp()
    // corpus: c12(x,x)=2, c12(u,v)=1; c1(x)=2, c1(u)=1; V = |{x,u,v}| = 3
    Seq((1L, "x x x"), (2L, "u v"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = analytics.Queries.textLmScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("lm_score"))).toMap
    // doc1: 2 bigrams, each ln(3/5) -> floor(-510825.62...) = -510826 µnats
    assert(m(1L) == ((2L, -0.5108)))
    // doc2: 1 bigram, ln(2/4) -> floor(-693147.18...) = -693148 µnats
    assert(m(2L) == ((1L, -0.6931)))
    assert(m(1L)._2 > m(2L)._2) // repetitive text is more probable under its own LM
  }

  // ---------------------------------------------------------- anomaly

  test("anomaly: 3-sigma outlier counting with exact-decimal moments") {
    import spark.implicits._
    val dir = tmp()
    // type 'a': 99 zeros + one 100 -> mean 1, std sqrt(99) ~ 9.95,
    // 3-sigma ~ 29.85: exactly one outlier. type 'b': constant -> std 0.
    val rows = (Seq.fill(99)(0.0) :+ 100.0).map(("a", _)) ++
      Seq(("b", 5.0), ("b", 5.0))
    rows.zipWithIndex
      .map { case ((t, v), i) =>
        (i.toLong, t, v, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("event_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = analytics.Queries.eventsAnomaly(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_value"),
         r.getAs[Long]("n_outliers"))).toMap
    assert(m("a") == ((100L, 1.0, 1L)))
    assert(m("b") == ((2L, 5.0, 0L))) // zero variance, zero outliers
  }

  // ------------------------------------------------- stream-stream join

  test("stream-stream join: time-bounded pairs match the batch semantics") {
    import spark.implicits._
    val h = 3600L * 1000000L // 1 hour in µs
    val t0 = 1700000000000000L
    val ev = Seq(
      (1L, "click", t0, 0.0),
      (1L, "purchase", t0 + h / 2, 10.5),  // within 1 h -> pair
      (1L, "purchase", t0 + 2 * h, 99.0),  // outside window
      (2L, "purchase", t0, 7.0),           // purchase BEFORE its click
      (2L, "click", t0 + h, 0.0))
      .toDF("user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val r = streaming.EventsStream.runStreamStreamJoin(spark, ev).collect()(0)
    assert(r.getAs[Long]("n_pairs") == 1)
    assert(r.getAs[Long]("n_users") == 1)
    assert(r.getAs[Double]("paired_value") == 10.5)
  }

  // ---------------------------------------------------------- WAV layer

  test("wav: synth -> parse round-trips the law; header structurally ok") {
    Seq(0, 1, 2, 17, 997).foreach { n =>
      val payload = Array.fill[Byte](n)('x')
      val blob = Wav.synth(payload)
      val p = Wav.parse(blob)
      assert(p.sampleRate == Wav.rateFor(n))
      assert(p.dataBytes / 2 == Wav.samplesFor(n))
      assert(p.channels == 1 && p.bits == 16 && p.headerOk)
      val f = Wav.features(blob, p)
      assert(f.nSamples == Wav.samplesFor(n))
      assert(f.durationMs == f.nSamples * 1000L / p.sampleRate)
    }
  }

  test("wav: features computed from bytes match hand-computed values") {
    // samples 3, -4, 0, 5: sumSq = 9+16+0+25 = 50, peak 5,
    // crossings: (3,-4) yes; (-4,0) no (strict product<0); (0,5) no
    val pcm = Array[Byte](3, 0, (-4 & 0xff).toByte, 0xff.toByte, 0, 0, 5, 0)
    val blob = Wav.encode(16000, pcm)
    val p = Wav.parse(blob)
    val f = Wav.features(blob, p)
    assert(f.nSamples == 4 && f.peak == 5)
    assert(math.abs(f.rms - math.sqrt(50.0 / 4)) < 1e-12)
    assert(f.zcr == 1.0 / 3)
  }

  test("wav: parser walks unknown chunks and rejects non-WAV payloads") {
    val pcm = Array[Byte](1, 0, 2, 0)
    val std = Wav.encode(8000, pcm)
    // splice an unknown 6-byte "junk" chunk between fmt and data
    val junk = "junkXX".getBytes("US-ASCII")
    val buf = java.nio.ByteBuffer.allocate(std.length + 8 + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(std, 0, 36)                      // RIFF..WAVE..fmt chunk
    buf.put("junk".getBytes("US-ASCII")).putInt(junk.length).put(junk)
    buf.put(std, 36, std.length - 36)        // data chunk
    val spliced = buf.array()
    // fix RIFF size for the inserted chunk so headerOk still holds
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val p = Wav.parse(spliced)
    assert(p.sampleRate == 8000 && p.dataBytes == 4 && p.headerOk)
    intercept[IllegalArgumentException] {
      Wav.parse("definitely not a wav".getBytes("US-ASCII") ++ new Array[Byte](40))
    }
  }
}
