package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Isolates the sketch-only half of `events_sliding_window_approx` (the
  * registry query also runs the exact reference aggregate its ±3% bound
  * check needs, so its bench time is approx + exact). Times both halves
  * separately through the noop sink. Usage: runMain with
  * SPARK_GRAFT_SF_DIR set. */
object ProbeSlidingHll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cellUs = 900L * 1000000L
    val ev = Tables.events(spark, sfDir)
    def sketchOnly() = ev
      .groupBy(expr(s"unix_micros(ts) div ${cellUs}L").as("cell"))
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"), count(lit(1)).as("n"))
      .select(col("sk"), col("n"),
        explode(expr("sequence(cell - 3, cell)")).as("w"))
      .groupBy((col("w") * cellUs).as("win_start_us"))
      .agg(hll_sketch_estimate(
          hll_union_agg(col("sk"), allowDifferentLgConfigK = false)).as("est"),
        sum(col("n")).as("n_events"))
    def exactOnly() = ev
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("wd"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"$tag pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("sketch-only")(sketchOnly())
    time("exact-only")(exactOnly())
    spark.stop()
  }
}
