package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the test-data star schema. One parquet file per table under
  * a scale-factor directory. At cluster scale these would be multi-file
  * partitioned datasets; `spark.read.parquet` handles both identically and
  * Catalyst pushes filters/projections into the scan either way.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped under three parquet physical encodings across
    * testdata generations; [[normalizeTs]] maps every one of them to a
    * plain µs TimestampType so downstream operators see ONE time type. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"), "ts")

  /** Normalize a timestamp column to µs `TimestampType` regardless of how
    * the parquet writer encoded it. The engine's schema contract: every
    * `Tables.events` frame carries `ts: TimestampType`, so strict-typed
    * consumers (`unix_micros`, `withWatermark`, `java.sql.Timestamp`
    * encoders) always resolve.
    *
    *  - `LongType` — TIMESTAMP(NANOS) surfaced as nanos-as-long under
    *    `spark.sql.legacy.parquet.nanosAsLong=true`; rescaled with integer
    *    DIV (a double round-trip would lose precision at 1e18 magnitudes).
    *  - `TimestampNTZType` — parquet `timestamp[us]` with
    *    isAdjustedToUTC=false. The session is pinned UTC, so the cast to
    *    TimestampType is value-preserving and matches how DuckDB reads the
    *    same file as a naive timestamp.
    *  - `TimestampType` — already the contract type; no-op.
    */
  def normalizeTs(df: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"$tsCol DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol,
          org.apache.spark.sql.functions.col(tsCol).cast(TimestampType))
      case _ => df
    }
  }

  /** Pre-round-7 name for [[normalizeTs]] (it now also heals NTZ). */
  def normalizeNanosTs(df: DataFrame, tsCol: String): DataFrame =
    normalizeTs(df, tsCol)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
