package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

object ProbeAsOfPushdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("asof-pushdown", "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    val out = graft.plans.AsOfJoin
      .asofNative(purchases, signups, "user_id", "ts", Seq("signup_ts"))
      .filter(col("event_id") < 1000L && col("signup_ts").isNotNull)
    out.collect()
    println("=== optimized ===")
    println(out.queryExecution.optimizedPlan.toString)
    println("=== executed ===")
    println(out.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
