package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Try

/** Batch ingestion into the landing layout.
  *
  * The reference fans out one download per (trip_type, month) and lands
  * files under `trip_type=X/partition_date=YYYYMM/` (ingest_data.py:17-37,
  * 101-109). In Spark the fan-out is simply a multi-path read — the
  * scheduler parallelizes per-file splits across executors, so explicit
  * orchestration-level fan-out is unnecessary; `mergeSchema` reconciles
  * per-batch schema drift (process_data_glue.py:137-139).
  *
  * The reference's orchestration also carries per-task RETRY and failure
  * isolation (Step Functions Retry policy, infra/main.tf:519): one bad
  * download fails its own (month, type) task, not the whole ingest.
  * [[readBatchResilient]] re-expresses that contract for the batch read:
  * each landing path is validated independently and corrupt ones are
  * QUARANTINED with their error instead of failing the batch — the first
  * thing a production ingest needs in week one.
  */
object Ingest {

  /** Read a batch of parquet files/directories as one DataFrame.
    * At scale: each path contributes its own splits; no driver-side loop. */
  def readBatch(spark: SparkSession, paths: Seq[String], mergeSchema: Boolean = true): DataFrame =
    spark.read
      .option("mergeSchema", mergeSchema.toString)
      .parquet(paths: _*)

  /** A landing path that failed validation, with the decode error. */
  final case class QuarantinedPath(path: String, reason: String)

  /** Fault-isolated batch read: validate every path's parquet FOOTERS
    * in ONE distributed job — the path list parallelizes across
    * executors and each task lists its path and opens every data file's
    * footer (metadata-only I/O, the same bytes scan planning touches;
    * per-file footer reads in tasks are the ParquetStats precedent).
    * A truncated or garbage landing file quarantines ITS path with the
    * error; every other partition lands. At the reference's fan-out
    * scale (years x months x types of landing partitions) this is one
    * job of O(paths) parallel footer parses, not thousands of
    * sequential driver round-trips. Opening each footer individually
    * also means a dir holding one healthy and one truncated file fails
    * validation now instead of failing the combined read later
    * (single-footer schema inference would sample the healthy file and
    * wave the path through). Cross-file schema-merge conflicts are NOT
    * pre-checked — they surface from the combined read, exactly as
    * cross-path conflicts always did.
    * `basePath` preserves hive-style partition columns when `paths` are
    * individual partition directories.
    *
    * Returns (good rows, quarantined paths). Callers append the
    * quarantine report to their audit sink — the disposition pattern of
    * `etl_dq_quarantine`, applied at file granularity. */
  def readBatchResilient(spark: SparkSession, paths: Seq[String],
                         mergeSchema: Boolean = true,
                         basePath: Option[String] = None)
      : (DataFrame, Seq[QuarantinedPath]) = {
    val confBc = spark.sparkContext.broadcast(
      new SerializableWritable(spark.sessionState.newHadoopConf()))
    val verdicts: Array[(String, Option[String])] = spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, 64)))
      .map { p =>
        val err = Try {
          val conf = confBc.value.value
          val root = new Path(p)
          val fs = root.getFileSystem(conf)
          val it = fs.listFiles(root, true)
          var dataFiles = 0
          while (it.hasNext) {
            val st = it.next()
            val name = st.getPath.getName
            if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
              dataFiles += 1
              // full footer parse; throws on truncation/garbage
              ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf)).close()
            }
          }
          if (dataFiles == 0)
            throw new IllegalArgumentException(s"no data files under $p")
        }.failed.toOption.map(e =>
          e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200))
        p -> err
      }.collect()
    val byPath = verdicts.toMap
    // preserve caller order in both outputs
    val bad = paths.flatMap(p => byPath(p).map(QuarantinedPath(p, _)))
    val good = paths.filter(p => byPath(p).isEmpty)
    val reader = spark.read.option("mergeSchema", mergeSchema.toString)
    val df =
      if (good.isEmpty)
        spark.emptyDataFrame
      else
        basePath.fold(reader)(b => reader.option("basePath", b)).parquet(good: _*)
    (df, bad)
  }

  /** Stamp landing-zone metadata: YYYYMM partition_date derived from the
    * event-time column (deterministic, unlike a wall-clock ingest stamp —
    * the reference's ingestion_timestamp is orchestration metadata, not
    * data). */
  def toLanding(df: DataFrame, tsCol: String): DataFrame =
    Features.partitionDate(df, tsCol)
}
