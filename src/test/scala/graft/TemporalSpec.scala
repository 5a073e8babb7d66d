package graft

import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("asof join: carried ts is the max right ts <= left ts per key") {
    val got = SparkEntry.joinAsof(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    // cross-check a brute-force computation via join + max
    val brute = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("u"), col("ts").as("lts"))
      .join(ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("u"), col("ts").as("rts")), Seq("u"), "left")
      .filter(col("rts").isNull || col("rts") <= col("lts"))
      .groupBy("event_id").agg(max(col("rts")).as("expect_ts"))
    val joined = got.join(brute, Seq("event_id"), "left")
    val bad = joined.filter(
      (col("signup_ts").isNotNull || col("expect_ts").isNotNull) &&
      (col("signup_ts") =!= col("expect_ts") ||
        col("signup_ts").isNull =!= col("expect_ts").isNull)).count()
    assert(bad == 0)
    // left rows with no prior signup carry NULL
    assert(got.filter(col("signup_ts").isNull).count() > 0)
    got.unpersist()
  }

  test("resample: dense per-key day grid, zero-filled gaps, forward fill") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 5.0), (1L, "2024-01-01 11:00:00", 7.0),
      (1L, "2024-01-04 09:00:00", 2.0), // days 2-3 are gaps
      (2L, "2024-01-02 08:00:00", 9.0))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = analytics.Temporal.resampleDaily(ev, "user_id", "ts", "value")
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
                 r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", 2L, 12.0, 7.0), // last of day 1 is the 11:00 event
      (1L, "2024-01-02", 0L, 0.0, 7.0),  // gap: zero count, value carried
      (1L, "2024-01-03", 0L, 0.0, 7.0),
      (1L, "2024-01-04", 1L, 2.0, 2.0),
      (2L, "2024-01-02", 1L, 9.0, 9.0))) // span is per key, not global
  }

  test("bucketed join plans without shuffle on either join side") {
    // force sort-merge joins so bucketing (not broadcast) decides the plan
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_bspec").toString
      graft.etl.Bucketing.writeBucketed(Tables.orders(spark, sf),
        "graft_spec_orders_b", s"$base/o", "o_orderkey", 8)
      graft.etl.Bucketing.writeBucketed(Tables.lineitem(spark, sf),
        "graft_spec_lineitem_b", s"$base/l", "l_orderkey", 8)
      def exchanges(p: String): Int =
        "Exchange hashpartitioning".r.findAllIn(p).length
      val bucketedJoin = spark.table("graft_spec_lineitem_b")
        .join(spark.table("graft_spec_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plainJoin = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      val b = exchanges(bucketedJoin.queryExecution.executedPlan.toString)
      val p = exchanges(plainJoin.queryExecution.executedPlan.toString)
      assert(b == 0, s"bucketed join should not shuffle, found $b exchanges")
      assert(p == 2, s"plain SMJ should shuffle both sides, found $p")
      // and the result is still correct
      assert(bucketedJoin.count() == plainJoin.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("range join covers every order exactly once") {
    val r = SparkEntry.joinRange(spark, sf)
    val total = r.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(total == Tables.orders(spark, sf).count())
  }
}
