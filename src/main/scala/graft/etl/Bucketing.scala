package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: writing both sides of a recurring join
  * bucketed (and sorted) by the join key lets Spark plan a sort-merge
  * join with NO shuffle on either side — each bucket pair joins locally.
  * At 100 TB this converts the nightly fact-fact join from the dominant
  * shuffle into a scan-side merge.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
