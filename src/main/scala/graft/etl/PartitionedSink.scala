package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-partitioned parquet sink, the consumer-layer layout.
  *
  * Ref: process_data_glue.py:186-190 writes
  * `partitionBy(trip_type, trip_year, trip_month)` with mode=overwrite.
  * We use DYNAMIC partition overwrite so re-processing one
  * (type, year, month) slice replaces only the partitions present in the
  * incoming frame — the reference's "only the matching partition is
  * affected" contract, but enforced by Spark rather than by pre-filtered
  * read paths. At 100 TB this is what makes month-level reprocessing
  * O(month) instead of O(table).
  */
object PartitionedSink {

  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df
      // one shuffle by the partition keys → one file per partition instead
      // of (tasks × partitions) small files; at cluster scale add a salt
      // to this repartition if single partitions exceed a task's write
      // budget
      .repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Read the sink back; partition columns are reconstructed from the
    * directory layout with type inference (process_data_glue.py:130). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("partitionColumnTypeInference", "true")
      .parquet(path)
}
