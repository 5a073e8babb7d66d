package graft

import org.apache.spark.sql.functions._

import graft.analytics.Queries
import graft.streaming.EventsStream

class AnalyticsSpec extends SparkSpec {

  test("pricing summary covers every (returnflag, linestatus) group") {
    val got = Queries.aggPricingSummary(spark, sf)
    val groups = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus").distinct().count()
    assert(got.count() == groups)
  }

  test("top customers is sorted desc by revenue, capped at 10") {
    val rows = Queries.joinTopCustomers(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("semi + anti partition the customer table") {
    val r = Queries.joinSemiAnti(spark, sf).collect()(0)
    val total = Tables.customer(spark, sf).count()
    assert(r.getAs[Long]("n_with_open") + r.getAs[Long]("n_without_open") == total)
  }

  test("sessionize: session count bounded by event count, gaps respected") {
    val s = Queries.windowSessionize(spark, sf)
    val nEvents = Tables.events(spark, sf).count()
    assert(s.agg(sum("n_events")).collect()(0).getLong(0) == nEvents)
    // every session spans <= its event range; starts never after ends
    assert(s.filter(col("session_start") > col("session_end")).count() == 0)
  }

  test("rollup includes grand total row") {
    val r = Queries.rollupPriority(spark, sf)
    val grand = r.filter(col("o_orderstatus") === "ALL" && col("o_orderpriority") === "ALL")
    assert(grand.count() == 1)
    assert(grand.collect()(0).getAs[Long]("n_orders") == Tables.orders(spark, sf).count())
  }

  test("approx distinct within bound of exact, and exact counts agree") {
    val exact = Queries.distinctCount(spark, sf).collect()(0).getAs[Long]("n_parts")
    val row = Queries.distinctApprox(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_parts") == exact)
    assert(row.getAs[Boolean]("parts_within_3pct"))
    assert(row.getAs[Boolean]("orders_within_3pct"))
  }

  test("mergeable HLL sketches: partitioned union obeys the merge law, near exact") {
    val row = Queries.distinctSketchMerge(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_days") > 1, "needs multiple day partitions to merge")
    assert(row.getAs[Boolean]("merge_law_ok"),
      "union of per-day sketches must estimate exactly the single-pass sketch")
    assert(row.getAs[Boolean]("merged_within_3pct"))
  }

  test("column profile: one row per column, exact facts consistent, estimate bounded") {
    val total = Tables.events(spark, sf).count()
    val rows = Queries.etlProfile(spark, sf).collect()
    assert(rows.map(_.getAs[String]("col_name")).toSeq ==
      Seq("event_type", "user_id", "value"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_present") + r.getAs[Long]("n_nulls") == total,
        s"${r.getAs[String]("col_name")}: present+nulls != total")
      assert(r.getAs[Long]("n_distinct") > 0)
      assert(r.getAs[Boolean]("apx_within_5pct"))
    }
  }

  test("funnel stages are monotonically non-increasing and order-aware") {
    val r = Queries.eventsFunnel(spark, sf).collect()(0)
    val (n, v, c, p) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_stage_view"),
      r.getAs[Long]("n_stage_click"), r.getAs[Long]("n_stage_purchase"))
    assert(v > 0, "corpus has view events")
    assert(n >= v && v >= c && c >= p, s"funnel not monotone: $n >= $v >= $c >= $p")
    // order-awareness: stage 2 counts clicks AFTER the first view, so it
    // must undercount the users who merely have both event types
    val both = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click"))
      .groupBy("user_id")
      .agg(count_distinct(col("event_type")).as("k"))
      .filter(col("k") === 2).count()
    assert(c <= both)
  }

  test("streaming hourly agg matches the batch equivalent") {
    // stage events into a directory so readStream can watch it
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val events = Tables.events(spark, sf)
    events.write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)

    val q = EventsStream.streamingHourlyAgg(spark, dir, staged.schema)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_hourly")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stream_hourly")
      .orderBy("window_start", "event_type").collect()
    val batch = EventsStream.hourlyAggBatch(events).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
  }
}
