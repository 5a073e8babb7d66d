package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.Tables

/** The reference's landing→consumer job (process_data_glue.py) as one
  * declarative composition, mapped onto the synthetic `events` table:
  *
  *   trip_type        ≈ event_type  ("purchase" plays yellow, "view" green)
  *   total_amount     ≈ value
  *   passenger_count  ≈ user_id
  *   pickup datetime  ≈ ts, split into tpep/lpep variants per fleet to
  *                      reproduce the divergent yellow/green schemas
  *
  * Stages (all projection/filter — the single shuffle in the whole
  * pipeline is the final partitioned write's file layout):
  *   per-fleet read → rename normalization → typed-NULL schema completion
  *   → unionByName → coalesce unification → DQ → temporal features.
  */
object ConsumerPipeline {

  val YellowType = "purchase"
  val GreenType  = "view"

  /** DQ ruleset, mirroring process_data_glue.py:60-69. */
  val dqRules: Seq[DqRule] = Seq(
    DqRule.Positive("passenger_count"),
    DqRule.NonNegative("total_amount"),
    DqRule.NotNull("pickup_datetime"))

  /** One fleet's landing frame with its fleet-specific timestamp column
    * name (yellow → tpep_pickup_datetime, green → lpep_pickup_datetime). */
  def fleetFrame(spark: SparkSession, sfDir: String, tripType: String,
                 tsName: String): DataFrame =
    SchemaUnify.normalizeNames(
      Tables.events(spark, sfDir).filter(col("event_type") === tripType),
      Map(
        "event_type" -> "trip_type",
        "value"      -> "total_amount",
        "user_id"    -> "passenger_count",
        "ts"         -> tsName))

  def yellow(spark: SparkSession, sfDir: String): DataFrame =
    fleetFrame(spark, sfDir, YellowType, "tpep_pickup_datetime")

  def green(spark: SparkSession, sfDir: String): DataFrame =
    fleetFrame(spark, sfDir, GreenType, "lpep_pickup_datetime")

  /** Union of the fleets with schemas completed and the pickup timestamp
    * unified — the pre-DQ consumer frame. */
  def unified(spark: SparkSession, sfDir: String): DataFrame = {
    val both = SchemaUnify.unionAll(Seq(yellow(spark, sfDir), green(spark, sfDir)))
    val completed = SchemaUnify.withMissingColumns(both, Map(
      "tpep_pickup_datetime" -> TimestampType,
      "lpep_pickup_datetime" -> TimestampType))
    SchemaUnify.coalesceInto(completed, "pickup_datetime",
      Seq("tpep_pickup_datetime", "lpep_pickup_datetime"))
  }

  /** Full consumer-layer frame: unified, DQ-cleaned, with trip_year /
    * trip_month partition features (process_data_glue.py:73-91).
    *
    * Materialized: seven downstream queries derive from this frame; in
    * the reference architecture it is a MATERIALIZED layer (the consumer
    * Delta table), so sharing one materialization per session is the
    * faithful small-scale analogue. Spark's cache manager dedupes by
    * canonicalized plan, so every call shares the entry. Spill-safe
    * MEMORY_AND_DISK and opt-out via graft.materialize (see
    * [[graft.Caching]]) — at 100 TB the consumer layer is a persisted
    * table, not an executor-memory cache. */
  def consumer(spark: SparkSession, sfDir: String): DataFrame =
    graft.Caching.materialize(Features.temporal(
      DataQuality.clean(unified(spark, sfDir), dqRules),
      "pickup_datetime"))
}
