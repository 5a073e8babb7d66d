package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming analytics over the events feed.
  *
  * The aggregation logic is ONE function applied to either a batch or a
  * streaming DataFrame — Structured Streaming's contract — so the batch
  * path doubles as the oracle-checkable equivalent of the streaming query.
  *
  * At scale: the watermark bounds state (late events beyond 1 hour are
  * dropped), and the tumbling window + event_type key gives a
  * low-cardinality shuffle; state store size is O(windows × types).
  */
object EventsStream {

  /** Tumbling 1-hour window aggregate per event type. Works on batch and
    * streaming frames alike. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
              col("event_type"), col("n_events"), col("total_value"))

  /** Batch equivalent (oracle: date_trunc-hour grouping). */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    hourlyAgg(events).orderBy("window_start", "event_type")

  /** Streaming source over a directory of event parquet files with the
    * given schema; watermarked so windowed state is bounded. */
  def streamingHourlyAgg(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    hourlyAgg(
      spark.readStream.schema(schema).parquet(dir)
        .withWatermark("ts", "1 hour"))
}
