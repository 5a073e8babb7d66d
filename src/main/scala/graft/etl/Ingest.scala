package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.{Failure, Success, Try}

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
    * independently (the same driver-side metadata read scan planning
    * performs — O(paths) metadata operations, no data I/O), then read
    * only the paths that parse. A truncated or garbage landing file
    * quarantines ITS path with the error; every other partition lands.
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
    val attempts = paths.map { p =>
      // footer/schema parse of just this path. mergeSchema=true HERE is
      // load-bearing regardless of the caller's flag: it forces EVERY
      // footer under the path to parse, so a dir holding one healthy
      // and one truncated file fails validation now instead of failing
      // the combined read later (single-footer inference would sample
      // the healthy file and wave the path through)
      p -> Try(spark.read.option("mergeSchema", "true").parquet(p).schema)
    }
    val bad = attempts.collect { case (p, Failure(e)) =>
      QuarantinedPath(p,
        e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200))
    }
    val good = attempts.collect { case (p, Success(_)) => p }
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
