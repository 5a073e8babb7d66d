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

  /** Dynamic partition overwrite driven by a partition SOURCE frame:
    * every partition present in `partitionSource` is replaced by the
    * matching rows of `df` — INCLUDING partitions whose reprocessed slice
    * is empty. Plain dynamic overwrite only touches partitions present in
    * the written rows, so a row filter that empties a partition silently
    * leaves its stale files behind; here those partitions are deleted
    * first. The partition list is distinct-aggregated (metadata-sized —
    * the same information a Delta commit carries), never the rows. */
  def overwritePartitions(df: DataFrame, partitionSource: DataFrame,
                          path: String, partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val cols = partitionCols.map(org.apache.spark.sql.functions.col)
    val emptied = partitionSource.select(cols: _*).distinct()
      .except(df.select(cols: _*).distinct())
      .collect() // partition tuples only: O(partitions), not O(rows)
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(hconf)
    emptied.foreach { row =>
      val rel = partitionCols.zipWithIndex.map { case (c, i) =>
        s"${escapePathName(c)}=${escapePathName(String.valueOf(row.get(i)))}"
      }.mkString("/")
      fs.delete(new org.apache.hadoop.fs.Path(base, rel), true)
    }
    write(df, path, partitionCols)
  }
}
