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

  test("forward as-of matches earliest-subsequent semantics") {
    val left = mkLeft(Seq(
      (1L, 10L, 1000L),   // right is exhausted for 10 -> NULL
      (2L, 10L, 400L),    // earliest signup >= 400 is 500
      (3L, 10L, 50L),     // earliest signup >= 50 is 100
      (4L, 20L, 700L),    // exact-equal ts -> inclusive match at 700
      (5L, 30L, 900L)))   // user with no signups -> NULL
    val right = mkRight(Seq((10L, 100L), (10L, 500L), (20L, 700L), (40L, 1L)))
    val out = AsOfJoin.asofNative(left, right, "user_id", "ts", Seq("signup_ts"),
      direction = AsOfJoin.Forward)
    assert(collect(out) == Set(
      (1L, 10L, None), (2L, 10L, Some(500L)), (3L, 10L, Some(100L)),
      (4L, 20L, Some(700L)), (5L, 30L, None)))
  }

  test("nearest as-of picks the closer side; ties prefer backward") {
    val left = mkLeft(Seq(
      (1L, 10L, 1000L),   // back 500 (d=500), no fwd -> 500
      (2L, 10L, 400L),    // back 100 (d=300) vs fwd 500 (d=100) -> 500
      (3L, 10L, 300L),    // back 100 (d=200) vs fwd 500 (d=200): tie -> 100
      (4L, 10L, 50L),     // no back, fwd 100 -> 100
      (5L, 30L, 900L)))   // no rows -> NULL
    val right = mkRight(Seq((10L, 100L), (10L, 500L)))
    val out = AsOfJoin.asofNative(left, right, "user_id", "ts", Seq("signup_ts"),
      direction = AsOfJoin.Nearest)
    assert(collect(out) == Set(
      (1L, 10L, Some(500L)), (2L, 10L, Some(500L)), (3L, 10L, Some(100L)),
      (4L, 10L, Some(100L)), (5L, 30L, None)))
  }

  test("tolerance null-extends matches beyond the bound") {
    val right = mkRight(Seq((10L, 100L), (10L, 500L)))
    // backward, tol = 200µs: the match exists but is too old -> NULL
    val back = AsOfJoin.asofNative(
      mkLeft(Seq((1L, 10L, 1000L), (2L, 10L, 600L))),
      right, "user_id", "ts", Seq("signup_ts"), tolerance = Some(200L))
    assert(collect(back) == Set((1L, 10L, None), (2L, 10L, Some(500L))))
    // forward, tol = 200µs: 500 is 250µs ahead of 250 -> NULL
    val fwd = AsOfJoin.asofNative(
      mkLeft(Seq((3L, 10L, 350L), (4L, 10L, 100L), (5L, 10L, 250L))),
      right, "user_id", "ts", Seq("signup_ts"),
      direction = AsOfJoin.Forward, tolerance = Some(200L))
    assert(collect(fwd) == Set(
      (3L, 10L, Some(500L)), (4L, 10L, Some(100L)), (5L, 10L, None)))
    // nearest, tol = 200µs: both sides out of bound -> NULL
    val near = AsOfJoin.asofNative(
      mkLeft(Seq((6L, 10L, 950L))),
      right, "user_id", "ts", Seq("signup_ts"),
      direction = AsOfJoin.Nearest, tolerance = Some(200L))
    assert(collect(near) == Set((6L, 10L, None)))
  }

  test("null-ts left rows are always null-extended") {
    import org.apache.spark.sql.functions.when
    val left = mkLeft(Seq((1L, 10L, 999L), (2L, 10L, 800L)))
      .withColumn("ts", when(col("event_id") === 2L, lit(null)
        .cast("timestamp")).otherwise(col("ts")))
    val right = mkRight(Seq((10L, 100L)))
    val out = AsOfJoin.asofNative(left, right, "user_id", "ts", Seq("signup_ts"))
    assert(collect(out) == Set((1L, 10L, Some(100L)), (2L, 10L, None)))
  }

  test("string keys survive buffer reuse (parity with the composed operator)") {
    // UTF8String keys exercise the ColCmp.retain copy path: a raw
    // reference into the sort iterator's reused row would rot as the
    // right cursor advances and silently corrupt lastKey comparisons
    val ev = Tables.events(spark, sf)
    val skey = concat(lit("user_"), (col("user_id") % 50).cast("string"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), skey.as("ukey"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(skey.as("ukey"), col("ts"), col("ts").as("signup_ts"))
    val composed = analytics.Temporal
      .asofBackward(purchases, signups, "ukey", "ts", Seq("signup_ts"))
      .select("event_id", "ukey", "ts", "signup_ts")
    val native = AsOfJoin
      .asofNative(purchases, signups, "ukey", "ts", Seq("signup_ts"))
      .select("event_id", "ukey", "ts", "signup_ts")
    assert(native.count() == purchases.count())
    assert(composed.exceptAll(native).isEmpty && native.exceptAll(composed).isEmpty)
  }

  test("mismatched key/ts types fail fast at build time") {
    val left = mkLeft(Seq((1L, 10L, 1000L)))
    val right = mkRight(Seq((10L, 100L)))
      .withColumn("user_id", col("user_id").cast("int"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofNative(left, right, "user_id", "ts", Seq("signup_ts"))
    }
    assert(e.getMessage.contains("key types must match"))
  }

  test("left-only filters push below the as-of join") {
    val left = mkLeft(Seq((1L, 10L, 1000L), (2L, 10L, 400L), (3L, 20L, 700L)))
    val right = mkRight(Seq((10L, 100L), (20L, 700L)))
    val out = AsOfJoin.asofNative(left, right, "user_id", "ts", Seq("signup_ts"))
      .filter(col("event_id") < 3L && col("signup_ts").isNotNull)
    // correctness first: the split filter must not change results
    assert(collect(out) == Set((1L, 10L, Some(100L)), (2L, 10L, Some(100L))))
    val optimized = out.queryExecution.optimizedPlan
    val asof = optimized.collectFirst { case a: AsOfJoin.AsOfJoinPlan => a }
    assert(asof.isDefined, s"as-of node missing from:\n$optimized")
    // the left-only conjunct (event_id < 3) sits BELOW the join...
    assert(asof.get.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.exists(_.condition.references.map(_.name).toSeq.contains("event_id")),
      s"left filter not pushed below as-of in:\n$optimized")
    // ...and the carry-column conjunct stays above it
    assert(optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoin.AsOfJoinPlan] => f
    }.exists(_.condition.references.map(_.name).toSeq.contains("signup_ts")),
      s"carry filter must stay above as-of in:\n$optimized")
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
