package graft

import org.apache.spark.sql.functions._

import graft.analytics.Queries

/** Round-8 second wave: point-in-interval stab join, CM-prefiltered
  * heavy hitters, path mining, exact-moment correlation, distribution
  * windows, dynamic file pruning. Laws pinned here; corpus-level
  * agreement is the oracle's job. */
class Round8bSpec extends SparkSpec {

  test("point-in-interval: bucketed stab equals brute force at any width") {
    import spark.implicits._
    val h = 3600L * 1000000L
    val iv = Seq(
      (1L, 0L * h, 3L * h),          // long interval
      (2L, 1L * h, 1L * h),          // point interval
      (3L, 2L * h + 1, 2L * h + 2),  // micro interval
      (4L, 5L * h, 6L * h)           // disjoint tail
    ).toDF("user_id", "s_us", "e_us")
    val pts = Seq(
      (10L, 0L),           // only interval 1 (inclusive start)
      (11L, 1L * h),       // intervals 1 and 2 (point interval hit)
      (12L, 2L * h + 2),   // intervals 1 and 3 (inclusive end)
      (13L, 3L * h),       // interval 1's inclusive end
      (14L, 4L * h),       // gap: stabs nothing
      (15L, 6L * h)        // interval 4
    ).toDF("event_id", "p_us")
    def bucketed(bucketUs: Long) = {
      val ivb = iv.withColumn("bucket",
        explode(expr(s"sequence(s_us div $bucketUs, e_us div $bucketUs)")))
      val ptb = pts.withColumn("bucket", expr(s"p_us div $bucketUs"))
      ptb.join(ivb, Seq("bucket"))
        .filter(col("s_us") <= col("p_us") && col("p_us") <= col("e_us"))
        .select(col("event_id"), col("user_id"))
        .orderBy("event_id", "user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val want = pts.crossJoin(iv)
      .filter(col("s_us") <= col("p_us") && col("p_us") <= col("e_us"))
      .select(col("event_id"), col("user_id"))
      .orderBy("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.contains((11L, 1L)) && want.contains((11L, 2L)) &&
      want.contains((13L, 1L)) && !want.exists(_._1 == 14L))
    // a point lands in exactly one bucket, so the equi-join can neither
    // duplicate nor drop a stab — at ANY width
    Seq(1000000L, 7L * 1000000L, h, 24L * h).foreach { b =>
      assert(bucketed(b) == want, s"stab set changed at bucketUs=$b")
    }
  }

  test("heavy hitters: CM prefilter is exact, even with a colliding sketch") {
    val bigrams = Tables.documents(spark, sf)
      .select(split(lower(col("text")), " ").as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") >= 2)
      .select(explode(expr(
        "transform(sequence(0, n - 2), i -> concat(w[i], ' ', w[i + 1]))")).as("elem"))
    val naive = bigrams.groupBy("elem").agg(count(lit(1)).as("n"))
    val total = bigrams.count()
    val thr = math.max(10L, total / 800L)
    val want = naive.filter(col("n") >= thr)
      .orderBy(col("n").desc, col("elem")).collect().toSeq
    val got = graft.text.Boilerplate.heavyHitters(bigrams).collect().toSeq
    assert(got == want && got.nonEmpty)
    // width 4 forces massive cell collisions: estimates inflate, the
    // candidate set balloons — but count-min never UNDERcounts, so the
    // exact re-filter still lands on precisely the same answer
    val collided = graft.text.Boilerplate
      .heavyHitters(bigrams, width = 4, depth = 2).collect().toSeq
    assert(collided == want)
  }

  test("path top-k: truncation at 5, total order, deterministic ties") {
    import spark.implicits._
    val s = 1000000L
    val ev = Seq(
      // user 1: seven events -> path is the FIRST FIVE only
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (1L, 5L, "e"), (1L, 6L, "f"), (1L, 7L, "g"),
      // user 2: same first five as user 1 -> same path, n_users = 2
      (2L, 11L, "a"), (2L, 12L, "b"), (2L, 13L, "c"), (2L, 14L, "d"),
      (2L, 15L, "e"),
      // user 3: duplicate timestamp broken by event_id (21 before 22)
      (3L, 21L, "x"), (3L, 21L, "y"), (3L, 23L, "z"),
      // user 4: single event
      (4L, 31L, "solo"))
    val df = ev.zipWithIndex.map { case ((u, t, ty), i) =>
      (i.toLong, u, t * s, ty)
    }.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    // duplicate-ts rows get event_ids in listing order, so x (id 12)
    // precedes y (id 13) deterministically
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val paths = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("rn"), col("event_type")))).as("a"))
      .select(concat_ws(">", expr("transform(a, x -> x.event_type)")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(paths == Seq(("a>b>c>d>e", 2L), ("solo", 1L), ("x>y>z", 1L)))
  }

  test("exact-moment correlation matches the built-in estimator") {
    val got = Queries.aggCorr(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ref = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (round(col("value") * 100) / 100.0).as("x"),
        hour(col("ts")).cast("double").as("y"))
      .groupBy("event_type").agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    // same statistic, different accumulation: the exact-moment form must
    // agree with the float estimator to well inside float noise (r is
    // scale-free, so cents-vs-dollars cancels)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-3,
      s"$k: exact-moment $v vs estimator ${ref(k)}") }
  }

  test("distributed rank equals the built-in window functions") {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(dec(col("o_totalprice")), col("o_orderkey"))
    // the naive plan: correct semantics, |groups|-way parallelism — the
    // distributed-rank plan must reproduce it bit-for-bit
    val naive = Tables.orders(spark, sf)
      .withColumn("q", ntile(4).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy(col("o_orderpriority"), col("q"))
      .agg(count(lit(1)).as("n_orders"),
           round(max(col("pr")), 4).as("max_pct_rank"),
           round(max(col("cd")), 4).as("max_cume_dist"),
           round(sum(dec(col("o_totalprice"))).cast("double"), 2).as("total_price"))
      .orderBy("o_orderpriority", "q").collect()
    val got = Queries.windowDistribution(spark, sf).collect()
    assert(got.sameElements(naive))
  }

  test("distribution windows: quartiles partition each priority") {
    val rows = Queries.windowDistribution(spark, sf).collect()
    val byPrio = rows.groupBy(_.getString(0))
    val orders = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPrio.keySet == orders.keySet)
    byPrio.foreach { case (prio, qs) =>
      assert(qs.map(_.getLong(2)).sum == orders(prio)) // quartiles partition
      val sizes = qs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1) // ntile balance law
      assert(math.abs(qs.map(_.getDouble(4)).max - 1.0) < 1e-9) // cume_dist tops at 1
    }
  }

  test("concurrent appends: every racing commit lands exactly once") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("txrace-spec").toString
    graft.acid.TxLog.overwrite(
      Seq((0L, 0.0)).toDF("id", "v"), path)
    // 8 writers race the commit claim; optimistic retry must serialize
    // them with zero lost transactions (the exists-check+rename hole
    // this spec exists to keep closed: POSIX rename overwrites)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      new Thread(() =>
        try graft.acid.TxLog.append(Seq((i.toLong, i * 1.0)).toDF("id", "v"), path)
        catch { case _: Throwable => failures.incrementAndGet() })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.get() == 0)
    assert(graft.acid.TxLog.currentVersion(spark, path) == 9L)
    val rows = graft.acid.TxLog.read(spark, path).collect()
    assert(rows.length == 9)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L to 8L))
  }

  test("gap fill: silent hours surface as explicit zero rows") {
    val rows = Queries.eventsGapFill(spark, sf).collect()
    val types = Tables.events(spark, sf)
      .select("event_type").distinct().count()
    val hours = rows.map(_.getLong(1)).distinct.sorted
    // dense spine: every hour between the corpus bounds, every type
    assert(hours.length == (hours.last - hours.head) / 3600000000L + 1)
    assert(rows.length == hours.length * types)
    // the fill must not invent events: per-type totals survive exactly
    val sums = rows.groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(2)).sum }
    val want = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == want)
    // sf0.001's sparse stream guarantees at least one silent hour — the
    // rows an aggregate-only plan would silently omit
    assert(rows.exists(_.getLong(2) == 0L))
  }

  test("sliding HLL: cell-union estimate equals the direct window sketch") {
    val cellUs = 900L * 1000000L
    val ev = Tables.events(spark, sf)
    val viaCells = ev
      .groupBy(expr(s"unix_micros(ts) div ${cellUs}L").as("cell"))
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
      .select(col("sk"), explode(expr("sequence(cell - 3, cell)")).as("w"))
      .groupBy((col("w") * cellUs).as("ws"))
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), allowDifferentLgConfigK = false)).as("est"))
    val direct = ev
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("wd"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 14)).as("est"))
      .select(unix_micros(col("wd.start")).as("ws"), col("est"))
    val both = viaCells.as("a").join(direct.as("b"), Seq("ws"), "full_outer")
      .collect()
    assert(both.nonEmpty)
    // the merge law (#95), per window: unioning the 4 cell sketches is
    // lossless — identical estimate to sketching the window directly,
    // which is what makes the constant-size fan-out plan exchangeable
    // for the exact one at any corpus scale
    both.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"window set mismatch: $r")
      assert(r.getLong(1) == r.getLong(2), s"merge law broken at $r")
    }
  }

  test("curation funnel: stages chain and only ever shrink") {
    val rows = SparkEntry.queries("corpus_curation_funnel")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_lang", "2_quality", "3_dedup", "4_contamination", "5_paragraph"))
    rows.foreach { r => assert(r.getLong(2) <= r.getLong(1),
      s"stage ${r.getString(0)} kept more than it saw") }
    // each stage's intake is exactly the previous stage's survivors
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) == a.getLong(2)) }
    assert(rows.last.getLong(2) > 0 && rows.last.getLong(3) > 0)
    // the paragraph stage keeps at most the doc-level survivors' token
    // mass (partial docs count only what remains)
    assert(rows(4).getLong(3) <= rows(3).getLong(3))
  }

  test("dynamic prune: skips files and agrees with the unpruned join") {
    val r = SparkEntry.queries("delta_dynamic_prune")(spark, sf).collect()(0)
    assert(r.getAs[Boolean]("pruned_files"),
      "runtime dim bounds failed to skip any fact file")
    assert(r.getAs[Boolean]("scanned_some"))
    val want = Tables.events(spark, sf)
      .join(
        Tables.events(spark, sf)
          .filter(col("event_type") === "purchase" &&
            to_date(col("ts")) === lit("2024-01-10"))
          .select("event_id"),
        Seq("event_id"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("value")), 2).as("total"),
           count_distinct(col("user_id")).as("n_users"))
      .collect()(0)
    assert(r.getAs[Long]("n_rows") == want.getAs[Long]("n_rows"))
    assert(r.getAs[Double]("total") == want.getAs[Double]("total"))
    assert(r.getAs[Long]("n_users") == want.getAs[Long]("n_users"))
    SparkEntry.cleanupTempDirs()
  }
}
