package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal feature engineering over an event-time column.
  *
  * Ref: process_data_glue.py:73-74 (trip_year / trip_month used both as
  * analysis features and as the sink partition keys) and
  * reporting_etl_job.py:149 (report_hour). All are scalar projections —
  * codegen'd, no shuffle — and the year/month pair doubles as the
  * partition layout, giving partition pruning to every downstream
  * month-scoped query.
  */
object Features {

  /** Append year/month/day/hour/dow columns derived from `tsCol`.
    * `dow` is 1=Sunday..7=Saturday (Spark `dayofweek` semantics). */
  def temporal(df: DataFrame, tsCol: String, prefix: String = "trip"): DataFrame =
    df.withColumn(s"${prefix}_year", year(col(tsCol)))
      .withColumn(s"${prefix}_month", month(col(tsCol)))
      .withColumn(s"${prefix}_day", dayofmonth(col(tsCol)))
      .withColumn(s"${prefix}_hour", hour(col(tsCol)))
      .withColumn(s"${prefix}_dow", dayofweek(col(tsCol)))

  /** YYYYMM partition-date string, the reference's landing-zone layout key
    * (ingest_data.py:24). */
  def partitionDate(df: DataFrame, tsCol: String, target: String = "partition_date"): DataFrame =
    df.withColumn(target, date_format(col(tsCol), "yyyyMM"))
}
