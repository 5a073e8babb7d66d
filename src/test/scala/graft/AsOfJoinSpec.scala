package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

/** The native as-of join (custom LogicalPlan + Strategy + merge
  * SparkPlan) against the composed tag/union/window operator and
  * hand-computed expectations. */
class AsOfJoinSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def mkLeft(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }
  private def mkRight(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("signup_ts", col("ts")).drop("us")
  }

  private def collect(df: DataFrame): Set[(Long, Long, Option[Long])] =
    df.select(col("event_id"), col("user_id"), unix_micros(col("signup_ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("native as-of matches hand-computed latest-prior semantics") {
    val left = mkLeft(Seq(
      (1L, 10L, 1000L),   // match: signup at 500 (latest of 100, 500)
      (2L, 10L, 400L),    // match: signup at 100
      (3L, 10L, 50L),     // no signup yet -> NULL
      (4L, 20L, 700L),    // exact-equal ts -> inclusive match at 700
      (5L, 30L, 900L)))   // user with no signups -> NULL
    val right = mkRight(Seq((10L, 100L), (10L, 500L), (20L, 700L), (40L, 1L)))
    val out = AsOfJoin.asofNative(left, right, "user_id", "ts", Seq("signup_ts"))
    assert(collect(out) == Set(
      (1L, 10L, Some(500L)), (2L, 10L, Some(100L)), (3L, 10L, None),
      (4L, 20L, Some(700L)), (5L, 30L, None)))
  }

  test("native equals the composed operator on the events corpus") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    val composed = analytics.Temporal
      .asofBackward(purchases, signups, "user_id", "ts", Seq("signup_ts"))
      .select("event_id", "user_id", "ts", "signup_ts")
    val native = AsOfJoin
      .asofNative(purchases, signups, "user_id", "ts", Seq("signup_ts"))
      .select("event_id", "user_id", "ts", "signup_ts")
    assert(native.count() == purchases.count()) // left-preserving
    assert(composed.exceptAll(native).isEmpty && native.exceptAll(composed).isEmpty)
  }

  test("plan uses AsOfJoinExec with one exchange and one sort per side") {
    val left = mkLeft(Seq((1L, 10L, 1000L)))
    val right = mkRight(Seq((10L, 100L)))
    val out = AsOfJoin.asofNative(left, right, "user_id", "ts", Seq("signup_ts"))
    out.collect() // force planning through AQE
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), // nodeName strips the Exec suffix
      s"expected the native operator in:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2,
      "both sides must shuffle on the key")
  }
}
