package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Queries

/** Isolates the distinct-pair cardinality term of the interval-overlap
  * join: exact `count_distinct(a_id, b_id)` holds Θ(distinct pairs)
  * state and spills at sf10 (~2 G pairs), while the HLL++ estimate is
  * constant-state. Times count-only, sketch, and exact aggregates over
  * the identical pair stream. Usage: runMain with SPARK_GRAFT_SF_DIR. */
object ProbeIntervalHll {
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
    val sessions = graft.Caching.materialize(
      Queries.windowSessionize(spark, sfDir)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("s_us"),
          unix_micros(col("session_end")).as("e_us")))
    val bucketUs = Queries.adaptiveBucketUs(sessions)
    def pairs() = Queries.intervalOverlapPairs(sessions, bucketUs)
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"$tag pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("count-only")(pairs().agg(count(lit(1))))
    time("count+hll")(pairs().agg(count(lit(1)),
      approx_count_distinct(struct(col("a_id"), col("b_id")), 0.02)))
    time("count+exact-distinct")(pairs().agg(count(lit(1)),
      count_distinct(col("a_id"), col("b_id"))))
    spark.stop()
  }
}
