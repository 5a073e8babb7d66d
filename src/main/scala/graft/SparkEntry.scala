package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl._
import graft.reporting.Reports

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query takes (spark, sfDir) and returns a DataFrame whose column
  * names AND row order match its `oracleSql` DuckDB equivalent exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q1AvgMonthly(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- helpers

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  /** Shared DQ predicate in oracle-SQL form (matches ConsumerPipeline.dqRules
    * after the rename mapping back to raw events columns). */
  private val dqSql =
    "user_id IS NOT NULL AND user_id > 0 AND value IS NOT NULL AND value >= 0 AND ts IS NOT NULL"

  // ----------------------------------------------------- reference surface

  /** #1 Q1: monthly avg of total_amount over the yellow fleet. */
  def q1AvgMonthly(s: SparkSession, dir: String): DataFrame = {
    val y = SchemaUnify.coalesceInto(
      ConsumerPipeline.yellow(s, dir), "pickup_datetime", Seq("tpep_pickup_datetime"))
    Reports.monthlyAvg(DataQuality.clean(y, ConsumerPipeline.dqRules),
      "pickup_datetime", "total_amount")
  }

  /** #2 Q2: hourly avg passenger_count over the unified fleet, month 1. */
  def q2AvgHourly(s: SparkSession, dir: String): DataFrame =
    Reports.hourlyAvg(
      ConsumerPipeline.consumer(s, dir).filter(col("trip_month") === 1),
      "pickup_datetime", "passenger_count")

  /** #3 DQ-cleaned consumer rows. */
  def etlDqClean(s: SparkSession, dir: String): DataFrame =
    ConsumerPipeline.consumer(s, dir)
      .select("event_id", "trip_type", "passenger_count", "total_amount", "pickup_datetime")
      .orderBy("event_id")

  /** #4 Schema unification: coalesced timestamp + provenance flag. */
  def etlSchemaUnify(s: SparkSession, dir: String): DataFrame =
    ConsumerPipeline.unified(s, dir)
      .select(
        col("event_id"), col("trip_type"), col("pickup_datetime"),
        col("tpep_pickup_datetime").isNotNull.as("from_yellow_schema"))
      .orderBy("event_id")

  /** #5 unionByName(allowMissingColumns) over divergent fleet schemas. */
  def etlUnionFleet(s: SparkSession, dir: String): DataFrame =
    SchemaUnify.unionAll(Seq(
        ConsumerPipeline.yellow(s, dir), ConsumerPipeline.green(s, dir)))
      .groupBy("trip_type")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("tpep_pickup_datetime").isNotNull.cast("long")).as("n_tpep"),
        sum(col("lpep_pickup_datetime").isNotNull.cast("long")).as("n_lpep"))
      .orderBy("trip_type")

  /** #6 Temporal feature engineering. (Casts to long: DuckDB's temporal
    * extractors return BIGINT, Spark's return INT — the driver's compare
    * is schema-sensitive.) */
  def etlFeatures(s: SparkSession, dir: String): DataFrame =
    ConsumerPipeline.consumer(s, dir)
      .select(col("event_id") +: Seq("trip_year", "trip_month", "trip_day",
        "trip_hour", "trip_dow").map(c => col(c).cast("long").as(c)): _*)
      .orderBy("event_id")

  /** #7 Partitioned consumer sink: write partitioned by
    * (trip_type, trip_year, trip_month), read back, count per partition. */
  def etlPartitionedSink(s: SparkSession, dir: String): DataFrame = {
    val path = tempDir("sink")
    PartitionedSink.write(
      ConsumerPipeline.consumer(s, dir)
        .select("event_id", "passenger_count", "total_amount",
                "trip_type", "trip_year", "trip_month"),
      path, Seq("trip_type", "trip_year", "trip_month"))
    PartitionedSink.read(s, path)
      .groupBy(col("trip_type"), col("trip_year").cast("long").as("trip_year"),
               col("trip_month").cast("long").as("trip_month"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("trip_type", "trip_year", "trip_month")
  }

  /** #8 Batch ingest into the landing layout (partition_date stamp). */
  def ingestBatch(s: SparkSession, dir: String): DataFrame =
    Ingest.toLanding(
      Tables.normalizeNanosTs(Ingest.readBatch(s, Seq(s"$dir/events.parquet")), "ts"), "ts")
      .select(col("event_id"), col("event_type").as("trip_type"),
              col("partition_date"))
      .orderBy("event_id")

  /** #9 Reporting-layer consumption: materialize Q1, read back sorted
    * (analysis/analytics_job.py). */
  def reportConsume(s: SparkSession, dir: String): DataFrame = {
    val path = tempDir("report")
    q1AvgMonthly(s, dir).write.mode("overwrite").parquet(path)
    s.read.parquet(path)
      .select("report_month", "avg_total_amount")
      .orderBy("report_month")
  }

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_avg_monthly"      -> (q1AvgMonthly _),
    "q2_avg_hourly"       -> (q2AvgHourly _),
    "etl_dq_clean"        -> (etlDqClean _),
    "etl_schema_unify"    -> (etlSchemaUnify _),
    "etl_union_fleet"     -> (etlUnionFleet _),
    "etl_features"        -> (etlFeatures _),
    "etl_partitioned_sink"-> (etlPartitionedSink _),
    "ingest_batch"        -> (ingestBatch _),
    "report_consume"      -> (reportConsume _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_avg_monthly" ->
      s"""SELECT strftime(ts, '%Y-%m') AS report_month,
         |       round(avg(value), 2) AS avg_total_amount
         |FROM events
         |WHERE event_type = 'purchase' AND $dqSql
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q2_avg_hourly" ->
      s"""SELECT hour(ts) AS report_hour,
         |       round(avg(user_id), 2) AS avg_passenger_count
         |FROM events
         |WHERE event_type IN ('purchase', 'view') AND $dqSql AND month(ts) = 1
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "etl_dq_clean" ->
      s"""SELECT event_id, event_type AS trip_type, user_id AS passenger_count,
         |       value AS total_amount, ts AS pickup_datetime
         |FROM events
         |WHERE event_type IN ('purchase', 'view') AND $dqSql
         |ORDER BY event_id""".stripMargin,

    "etl_schema_unify" ->
      """SELECT event_id, event_type AS trip_type, ts AS pickup_datetime,
        |       (event_type = 'purchase') AS from_yellow_schema
        |FROM events
        |WHERE event_type IN ('purchase', 'view')
        |ORDER BY event_id""".stripMargin,

    "etl_union_fleet" ->
      """SELECT event_type AS trip_type, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_tpep,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_lpep
        |FROM events
        |WHERE event_type IN ('purchase', 'view')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "etl_features" ->
      s"""SELECT event_id, year(ts) AS trip_year, month(ts) AS trip_month,
         |       day(ts) AS trip_day, hour(ts) AS trip_hour,
         |       dayofweek(ts) + 1 AS trip_dow
         |FROM events
         |WHERE event_type IN ('purchase', 'view') AND $dqSql
         |ORDER BY event_id""".stripMargin,

    "etl_partitioned_sink" ->
      s"""SELECT event_type AS trip_type, year(ts) AS trip_year,
         |       month(ts) AS trip_month, count(*) AS n_rows
         |FROM events
         |WHERE event_type IN ('purchase', 'view') AND $dqSql
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "ingest_batch" ->
      """SELECT event_id, event_type AS trip_type,
        |       strftime(ts, '%Y%m') AS partition_date
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "report_consume" ->
      s"""SELECT strftime(ts, '%Y-%m') AS report_month,
         |       round(avg(value), 2) AS avg_total_amount
         |FROM events
         |WHERE event_type = 'purchase' AND $dqSql
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
