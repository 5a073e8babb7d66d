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
  /** events.ts is stored as TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a long of
    * nanos, rescaled here to a µs TimestampType (integer DIV — no double
    * round-trip, which would lose precision at 1e18 magnitudes). */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeNanosTs(load(s, d, "events"), "ts")

  /** Rescale a nanos-as-long timestamp column to µs TimestampType
    * (integer DIV — no double round-trip, which would lose precision at
    * 1e18 magnitudes). No-op if the column is already a timestamp. */
  def normalizeNanosTs(df: DataFrame, tsCol: String): DataFrame =
    if (df.schema(tsCol).dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(tsCol,
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"$tsCol DIV 1000")))
    else df
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
