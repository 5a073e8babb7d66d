package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for parquet layouts.
  *
  * Streaming micro-batches and per-task writes accumulate files far below
  * the ideal scan granularity; at 100 TB an uncompacted table turns every
  * query's file-listing + footer-reads into the bottleneck. Compaction
  * rewrites a directory to ~`targetBytes` files using the actual on-disk
  * size (not row counts) to pick the file count.
  */
object Compaction {

  /** Total bytes of parquet data under `path` (driver-side listing — the
    * same metadata a commit protocol touches, not a data scan). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) st.getLen
        else 0L
      }.sum
    walk(hPath)
  }

  def parquetFileCount(spark: SparkSession, path: String): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) 1
        else 0
      }.sum
    walk(hPath)
  }

  /** Rewrite `src` into `dst` with ~targetBytes output files. Reads the
    * whole layout once, coalesces (no shuffle — file-level concatenation),
    * writes once. */
  def compact(spark: SparkSession, src: String, dst: String,
              targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val bytes = math.max(dataBytes(spark, src), 1L)
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(src).coalesce(files)
      .write.mode("overwrite").parquet(dst)
    spark.read.parquet(dst)
  }
}
