package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch ingestion into the landing layout.
  *
  * The reference fans out one download per (trip_type, month) and lands
  * files under `trip_type=X/partition_date=YYYYMM/` (ingest_data.py:17-37,
  * 101-109). In Spark the fan-out is simply a multi-path read — the
  * scheduler parallelizes per-file splits across executors, so explicit
  * orchestration-level fan-out is unnecessary; `mergeSchema` reconciles
  * per-batch schema drift (process_data_glue.py:137-139).
  */
object Ingest {

  /** Read a batch of parquet files/directories as one DataFrame.
    * At scale: each path contributes its own splits; no driver-side loop. */
  def readBatch(spark: SparkSession, paths: Seq[String], mergeSchema: Boolean = true): DataFrame =
    spark.read
      .option("mergeSchema", mergeSchema.toString)
      .parquet(paths: _*)

  /** Stamp landing-zone metadata: YYYYMM partition_date derived from the
    * event-time column (deterministic, unlike a wall-clock ingest stamp —
    * the reference's ingestion_timestamp is orchestration metadata, not
    * data). */
  def toLanding(df: DataFrame, tsCol: String): DataFrame =
    Features.partitionDate(df, tsCol)
}
