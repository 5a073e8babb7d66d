package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventsStream

/** Round-8 operators: the stream-stream LEFT OUTER join's
  * state-eviction emit path. Edge semantics pinned on constructed data
  * (the sf oracle checks corpus-level agreement with the batch left
  * join; this checks the streaming-only laws — exactly-once null
  * emission and state drain). */
class Round8Spec extends SparkSpec {

  private def eventsDf(rows: Seq[(Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  test("stream-stream outer: unmatched clicks emit exactly once, state drains") {
    val s = 1000000L // 1 second in µs
    val hr = 3600 * s
    // modern base time, not epoch 0: an outer join's derived state
    // watermark (global watermark + the join-condition constraint) sits
    // ~1h above the epoch floor in batch 0, so epoch-adjacent rows would
    // be dropped as late before ever reaching the join buffers
    val t0 = 1704067200L * s // 2024-01-01T00:00:00Z
    val df = eventsDf(Seq(
      // user 1: click with a purchase 30 min later -> matched pair
      (1L, t0, "click", 0.0), (1L, t0 + hr / 2, "purchase", 10.0),
      // user 2: click never converts -> ONE null-extended row via eviction
      (2L, t0, "click", 0.0),
      // user 3: purchase with no click -> absent (left outer on clicks)
      (3L, t0, "purchase", 30.0),
      // user 4: purchase 2h after the click -> outside window, click unmatched
      (4L, t0, "click", 0.0), (4L, t0 + 2 * hr, "purchase", 40.0)))
    val r = EventsStream.runStreamStreamOuterJoin(spark, df).collect()(0)
    // 1 matched pair + 2 unmatched clicks; were eviction re-emitting on
    // the second sentinel batch, n_unmatched would read 4, not 2
    assert(r.getAs[Long]("n_rows") == 3)
    assert(r.getAs[Long]("n_pairs") == 1)
    assert(r.getAs[Long]("n_unmatched") == 2)
    assert(r.getAs[Long]("n_users") == 3)
    assert(r.getAs[Double]("paired_value") == 10.0)
  }

  test("stream-stream FULL outer: both buffers null-extend exactly once") {
    val s = 1000000L
    val hr = 3600 * s
    val t0 = 1704067200L * s
    val df = eventsDf(Seq(
      (1L, t0, "click", 0.0), (1L, t0 + hr / 2, "purchase", 10.0),
      (2L, t0, "click", 0.0),                     // click never converts
      (3L, t0, "purchase", 30.0),                 // purchase with no click
      (4L, t0, "click", 0.0), (4L, t0 + 2 * hr, "purchase", 40.0))) // both orphaned
    val r = EventsStream.runStreamStreamFullOuterJoin(spark, df).collect()(0)
    assert(r.getAs[Long]("n_rows") == 5)          // 1 pair + 2 + 2 orphans
    assert(r.getAs[Long]("n_pairs") == 1)
    assert(r.getAs[Long]("n_click_only") == 2)    // users 2 and 4
    assert(r.getAs[Long]("n_purchase_only") == 2) // users 3 and 4
    assert(r.getAs[Long]("n_users") == 4)
    assert(r.getAs[Double]("paired_value") == 10.0)
  }

  test("stream-stream outer equals the batch left join on the events corpus") {
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    val batch = c.join(p, expr(
        "user_id = p_user AND purchase_ts >= click_ts AND " +
          "purchase_ts <= click_ts + interval 1 hour"), "left_outer")
      .agg(count(lit(1)).as("n_rows"),
           count(col("purchase_ts")).as("n_pairs"),
           sum(when(col("purchase_ts").isNull, 1L).otherwise(0L)).as("n_unmatched"),
           count_distinct(col("user_id")).as("n_users"),
           round(sum(col("value").cast("decimal(18,2)")), 2).cast("double")
             .as("paired_value"))
      .collect()(0)
    val stream = EventsStream.runStreamStreamOuterJoin(spark, ev).collect()(0)
    assert(stream == batch)
  }

  test("span index: incremental batches equal the full recompute") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),        // spans abc..h, bcd..i, cde..j
      (2L, "a b c d e f g h"),            // exactly one span, shared with doc 1
      (3L, "x y z w v u t s r"),          // disjoint spans
      (4L, "a b c d e f g h i j"),        // duplicate of doc 1
      (5L, "too short")                   // below k, contributes nothing
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("spanidx-spec").toString
    spark.sql("DROP TABLE IF EXISTS span_idx_spec")
    graft.text.SpanIndex.initIndex(
      docs.filter(col("doc_id") <= 2), "span_idx_spec", path)
    graft.text.SpanIndex.appendBatch(
      docs.filter(col("doc_id") > 2), "span_idx_spec")
    val inc = graft.text.SpanIndex.stats(spark, "span_idx_spec").collect()(0)
    // full recompute over the same docs via the #99 operator body
    val full = graft.text.SpanIndex.batchSpanPartials(docs)
      .agg(count(lit(1)).as("n_distinct_spans"),
        sum(col("occ")).as("n_span_instances"),
        sum(when(col("docs") >= 2, 1L).otherwise(0L)).as("n_cross_doc_spans"),
        max(col("docs")).as("max_span_doc_freq"))
      .collect()(0)
    assert(inc == full)
    // and the law the data was built to pin: doc1∩doc2 share 1 span,
    // doc4 duplicates doc1's 3 spans -> abc..h seen in 3 docs
    assert(inc.getAs[Long]("max_span_doc_freq") == 3L)
    spark.sql("DROP TABLE IF EXISTS span_idx_spec")
  }

  test("bucketed interval join counts each overlapping pair exactly once") {
    import spark.implicits._
    val h = 3600L * 1000000L
    // intervals chosen to hit every attribution case: multi-bucket
    // overlap (1,2 share 3 buckets), touch-at-boundary (1,3 share one
    // µs), containment (4 inside 2), disjoint (5), same-bucket
    // non-overlap (6 vs 3)
    val iv = Seq(
      (1L, 0L * h, 3L * h),
      (2L, 1L * h, 5L * h),
      (3L, 3L * h, 3L * h + 100),
      (4L, 2L * h, 2L * h + 10),
      (5L, 7L * h, 8L * h),
      (6L, 3L * h + 500, 3L * h + 600)
    ).toDF("user_id", "s_us", "e_us")
    val got = graft.analytics.Queries.intervalOverlapPairs(iv, h)
      .orderBy("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force reference over the same intervals
    val want = iv.as("a").crossJoin(iv.as("b"))
      .filter(col("a.user_id") < col("b.user_id") &&
        col("a.s_us") <= col("b.e_us") && col("b.s_us") <= col("a.e_us"))
      .select(col("a.user_id"), col("b.user_id"))
      .orderBy("a.user_id", "b.user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq) // exactly-once: no bucket dup survives
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) &&
      got.contains((2L, 4L)) && !got.exists(p => p._1 == 5L || p._2 == 5L) &&
      !got.contains((3L, 6L)))
    // bucket-invariance: width moves work between explode fan-out and
    // per-bucket blowup but can NEVER change the pair set — the adaptive
    // width in joinIntervalOverlap leans on exactly this law
    Seq(7L * 1000000L, 997L * 1000000L, 24L * h).foreach { b =>
      val alt = graft.analytics.Queries.intervalOverlapPairs(iv, b)
        .orderBy("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(alt.toSeq == want.toSeq, s"pair set changed at bucketUs=$b")
    }
  }

  test("streaming audio extraction equals the batch codec run") {
    // deterministic subset (limit() is plan-order-dependent across runs)
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 40)
    val batch = graft.multimodal.BinaryColumns.audioMeta(docs).toDF()
      .orderBy("doc_id").collect()
    val streamed = graft.streaming.StreamAudio.run(spark, Seq(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0)))
      .orderBy("doc_id").collect()
    // the feature law is pure: micro-batched extraction must be
    // byte-identical to the single-pass batch run, one row per doc
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("source-span index: incremental overlap equals the batch recompute") {
    val docs = Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("ovidx-spec").toString
    spark.sql("DROP TABLE IF EXISTS ov_idx_spec")
    graft.text.SpanIndex.initSourceIndex(
      docs.filter(col("doc_id") % 2 === 0), "ov_idx_spec", path)
    graft.text.SpanIndex.appendSourceBatch(
      docs.filter(col("doc_id") % 2 =!= 0), "ov_idx_spec")
    val inc = graft.text.SpanIndex.overlap(spark, "ov_idx_spec").collect()
    val full = graft.analytics.Queries.corpusOverlap(spark, sf).collect()
    assert(inc.nonEmpty && inc.sameElements(full))
    spark.sql("DROP TABLE IF EXISTS ov_idx_spec")
  }

  test("source-span index: dedup fold and pair self-join ride the buckets") {
    import spark.implicits._
    val docs = (1L to 20L).map(i =>
      (i, s"src${i % 3}", s"w$i a b c d e f g h tail${i % 2}"))
      .toDF("doc_id", "source", "text")
    val path = java.nio.file.Files.createTempDirectory("ovidx-plan").toString
    spark.sql("DROP TABLE IF EXISTS ov_idx_plan")
    graft.text.SpanIndex.initSourceIndex(docs, "ov_idx_plan", path)
    val foldPlan = graft.text.SpanIndex
      .dedupedSourceSpans(spark, "ov_idx_plan")
      .queryExecution.executedPlan.toString
    assert(!foldPlan.contains("Exchange hashpartitioning"),
      s"cross-batch dedup fold re-shuffled the bucketed index:\n$foldPlan")
    // full overlap: the only hash exchanges permitted are the two
    // OUTPUT-sized aggregates (per-source sizes, per-pair rollup) and
    // their join alignment — the span-keyed dedup + self-join must not
    // shuffle the corpus-sized span stream
    val plan = graft.text.SpanIndex.overlap(spark, "ov_idx_plan")
      .queryExecution.executedPlan.toString
    val spanKeyed = "Exchange hashpartitioning\\(span_hash".r
      .findAllIn(plan).size
    assert(spanKeyed == 0,
      s"span-keyed exchange above the bucketed scan:\n$plan")
    spark.sql("DROP TABLE IF EXISTS ov_idx_plan")
  }

  test("span index: per-span fold runs with zero exchanges above the scan") {
    import spark.implicits._
    val docs = (1L to 20L).map(i =>
      (i, s"w$i a b c d e f g h tail${i % 3}")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("spanidx-plan").toString
    spark.sql("DROP TABLE IF EXISTS span_idx_plan")
    graft.text.SpanIndex.initIndex(docs, "span_idx_plan", path)
    val plan = graft.text.SpanIndex.perSpanTotals(spark, "span_idx_plan")
      .queryExecution.executedPlan.toString
    // the bucketed layout satisfies the groupBy distribution: the fold
    // must not re-shuffle the index (O(corpus) exchange per query is
    // exactly what the incremental design exists to avoid)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"span-partial fold re-shuffled the bucketed index:\n$plan")
    spark.sql("DROP TABLE IF EXISTS span_idx_plan")
  }

  test("rolling RANGE window: inclusive bounds, duplicate-ts peers share a frame") {
    val s = 1000000L
    val hr = 3600 * s
    val t0 = 1704067200L * s
    val ev = eventsDf(Seq(
      // user 1: four events; at t0+1h the frame still holds t0 (inclusive
      // lower bound), at t0+1h+1µs it no longer does
      (1L, t0, "e", 1.0), (1L, t0 + hr / 2, "e", 2.0),
      (1L, t0 + hr, "e", 4.0), (1L, t0 + hr + 1, "e", 8.0),
      // user 2: duplicate timestamps — RANGE peers see each other, so
      // BOTH rows already count 2 (a ROWS frame would depend on order)
      (2L, t0, "e", 1.0), (2L, t0, "e", 1.0)))
    val got = graft.analytics.Queries.rollingRangePeaks(ev, hr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user 1 peak: frame at t0+1h = {1,2,4} -> n=3, cents=700; the
    // t0+1h+1µs frame = {2,4,8} -> n=3, cents=1400 (larger sum, same n)
    assert(got == Seq((1L, 3L, 1400L), (2L, 2L, 200L)))
  }

  test("tf-idf: rarer terms outrank frequent ones; ties break on term asc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana rare"),
      (2L, "apple banana"),
      (3L, "apple banana cherry")).toDF("doc_id", "text")
    val got = graft.analytics.Queries.tfidfTopTerms(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // idf_micro: apple/banana df=3 -> 0, rare/cherry df=1 -> ln(2)*1e6.
    // doc 1: rare wins (tf=1 on positive idf beats tf=2 on zero idf);
    // apple/banana tie at score 0 -> lexicographic
    assert(got.take(3) == Seq((1L, 1L, "rare"), (1L, 2L, "apple"), (1L, 3L, "banana")))
    assert(got.filter(_._1 == 3L).head._3 == "cherry")
  }

  test("grouping sets: marginals + grand total, no cross level") {
    val got = graft.analytics.Queries.aggGroupingSets(spark, sf).collect()
    val keys = got.map(r => (r.getString(0), r.getString(1))).toSeq
    // every row has at least one ALL key — the cross level is absent
    assert(keys.forall { case (a, b) => a == "ALL" || b == "ALL" })
    assert(keys.count { case (a, b) => a == "ALL" && b == "ALL" } == 1)
    // marginals each sum to the grand total
    val grand = got.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get.getLong(2)
    val byStatus = got.filter(r => r.getString(0) != "ALL").map(_.getLong(2)).sum
    val byPrio = got.filter(r => r.getString(1) != "ALL").map(_.getLong(2)).sum
    assert(byStatus == grand && byPrio == grand)
  }

  test("sliding windows: each event lands in exactly duration/slide windows") {
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val windows = graft.analytics.Queries.eventsSlidingWindow(spark, sf)
    val total = windows.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total == 4 * n, "1h/15m slide: every event must appear in 4 windows")
    // window starts are slide-aligned
    val misaligned = windows
      .filter(col("win_start_us") % (900L * 1000000L) =!= 0).count()
    assert(misaligned == 0)
  }

  test("phrase search: adjacent-only matches, counted per document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join beats sort"),      // one hit
      (2L, "hash anti join"),            // adjacency broken -> no hit
      (3L, "Hash JOIN or hash join"),    // case-folded, two hits
      (4L, "join hash")).toDF("doc_id", "text") // order matters -> no hit
    val got = graft.analytics.Queries.phraseHits(docs, "hash", "join")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (3L, 2L)))
  }
}
