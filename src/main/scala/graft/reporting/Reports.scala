package graft.reporting

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reporting-layer aggregations.
  *
  * Generalizes the reference's two reports (reporting_etl_job.py):
  *  - Q1 (:73-105): avg of a measure per (year, month), formatted
  *    `report_month = "YYYY-MM"`, rounded to 2 decimals.
  *  - Q2 (:108-161): avg of a measure per hour-of-day over a unified
  *    fleet, rounded to 2 decimals.
  * Both are algebraic aggregates → map-side partials; the only shuffle is
  * by the (tiny-cardinality) group key, so they scale linearly with input
  * and the result is always driver-sized.
  */
object Reports {

  /** Avg(measure) per calendar month of `tsCol`. */
  def monthlyAvg(df: DataFrame, tsCol: String, measure: String,
                 outCol: String = "avg_total_amount"): DataFrame =
    df.groupBy(year(col(tsCol)).as("trip_year"), month(col(tsCol)).as("trip_month"))
      .agg(round(avg(col(measure)), 2).as(outCol))
      .select(
        concat_ws("-", col("trip_year"),
          lpad(col("trip_month").cast("string"), 2, "0")).as("report_month"),
        col(outCol))
      .orderBy("report_month")

  /** Avg(measure) per hour-of-day of `tsCol`. */
  def hourlyAvg(df: DataFrame, tsCol: String, measure: String,
                outCol: String = "avg_passenger_count"): DataFrame =
    df.filter(col(tsCol).isNotNull)
      .groupBy(hour(col(tsCol)).cast("long").as("report_hour"))
      .agg(round(avg(col(measure)), 2).as(outCol))
      .orderBy("report_hour")

  /** Schema-stable empty report (reporting_etl_job.py:65-70): downstream
    * consumers always find a readable table, even with no input. */
  def emptyReport(spark: SparkSession, schema: StructType, path: String): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(path)
}
