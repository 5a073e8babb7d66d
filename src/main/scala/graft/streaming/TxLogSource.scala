package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.acid.TxLog

/** `spark.readStream.format("graft-table")` — a REAL Structured
  * Streaming source over txlog (ACID) tables, replacing the hand-rolled
  * [[ChangeFeedCursor]] pump for standard pipelines: ANY writeStream
  * sink/agg/join can now consume an ACID table's change feed with the
  * engine's own checkpointing, triggers, and restart semantics
  * (reference: the consumer-table hand-off process_data_glue.py:186-190
  * → reporting_etl_job.py:48, made continuous).
  *
  * Design — the Delta Lake streaming-source shape (a v1 `Source`, not a
  * DSv2 scan): each micro-batch is the half-open commit range
  * `(start, end]`, and `getBatch` answers it with a DataFrame built
  * from the commit log's own file actions ([[TxLog.readChangeFeed]]) —
  * the driver plans a partition-pruned parquet read of exactly the
  * changed files, executors never see the log. The v1 contract is what
  * makes that possible: a source that must assemble its batch from
  * catalog metadata returns a full logical plan, where a DSv2
  * `PartitionReader` would have to re-implement the parquet reader.
  *
  * Exactly-once: offsets ARE commit versions (`LongOffset(v)` = "all
  * commits ≤ v delivered"), checkpointed by the engine in the standard
  * offset log. A batch is a pure function of a closed version range
  * over an append-only log, so replay after a crash re-reads
  * bit-identical rows, and the engine's batch-id dedup (file sink log,
  * state store) does the rest. `getOffset` is one log listing — a
  * no-new-commits poll costs no data I/O; a batch reads O(changed rows)
  * (cdc files for merges/deletes, add files for appends), never a
  * table scan — the 100 TB CDC-consumer contract.
  *
  * Options: `path` (table root, required), `startVersion` (first commit
  * to deliver; default 1 = full history — commit 1 is the first commit
  * carrying data in every writer path here).
  */
final class TxLogSource(sqlContext: SQLContext, table: String,
                        startVersion: Long) extends Source {

  private val spark = sqlContext.sparkSession

  override val schema: StructType = TxLogSource.feedSchema(spark, table)

  /** Latest committed version, as the engine's target offset — null
    * (no batch) until the table reaches `startVersion`. */
  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] = {
    val current = TxLog.currentVersion(spark, table)
    if (current < startVersion) None else Some(LongOffset(current))
  }

  private def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case LongOffset(v) => v
      case s: SerializedOffset => s.json.trim.toLong
      case other => other.json.trim.toLong
    }

  /** Changes of commits `(start, end]` — `start` is exclusive (already
    * delivered), exactly the engine's offset-range contract. */
  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val lo = start.map(versionOf(_) + 1).getOrElse(startVersion)
    val hi = versionOf(end)
    // re-ordered to the declared schema: readChangeFeed appends the CDF
    // columns, but a restarted query compares schemas structurally
    val batch = TxLog.readChangeFeed(spark, table, lo, Some(hi))
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    // the v1 Source contract, two halves (the Kafka source's
    // internalCreateDataFrame shape): the frame must CARRY the
    // isStreaming bit (MicroBatchExecution asserts it), and every batch
    // must present IDENTICAL schema INCLUDING nullability — an append
    // batch carries `_change_type` as a non-nullable literal while a
    // merge batch reads it from cdc parquet as nullable, and a restarted
    // stateful query hard-fails on that key-schema drift
    // (STATE_STORE_KEY_SCHEMA_NOT_COMPATIBLE). Plan-level relaxation
    // can't pin this (Dataset.to keeps the tighter side, KnownNullable
    // tags are stripped by the optimizer), so the batch is presented
    // through the declared schema verbatim; rows stay lazy.
    org.apache.spark.sql.GraftPlanBridge.asStreamingBatch(spark, batch, schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"TxLogSource[$table, from=$startVersion]"
}

object TxLogSource {
  /** The feed schema: the table's CURRENT schema plus the CDF columns,
    * all nullable — batches span commit types whose natural nullability
    * differs (appends project literals, merges read cdc parquet), and
    * the one declared schema must be reachable from every batch by
    * RELAXING, never narrowing. Resolved once at source creation —
    * schema evolution mid-stream fails loudly at the engine's schema
    * check rather than drifting. */
  def feedSchema(spark: org.apache.spark.sql.SparkSession,
                 table: String): StructType = {
    val base = TxLog.read(spark, table).schema
    StructType((base.fields :+
      StructField("_change_type", StringType) :+
      StructField("_commit_version", LongType))
      .map(_.copy(nullable = true)))
  }
}

/** `writeStream.format("graft-table")` — the SINK face: continuous
  * ingestion INTO an ACID table (the reference's consumer-table write
  * process_data_glue.py:186-190, made continuous). Each micro-batch is
  * ONE transactional append whose commit TAG carries the batch id, so
  * sink state and ingested data move atomically — the same
  * consumer-watermark discipline [[StreamMv]] uses for folds.
  *
  * Exactly-once across restarts: the engine re-offers a batch whose
  * sink write it cannot prove completed; [[addBatch]] reads the
  * highest applied batch id back from the commit tags (one driver log
  * listing) and SKIPS re-offered ids — a crash between the append
  * commit and the engine's own batch bookkeeping re-delivers, the tag
  * says "already applied", nothing doubles. First batch bootstraps the
  * table (schema from the stream, sink-declared partition columns) as
  * an empty v1 overwrite + tagged append, so `create-if-absent` needs
  * no side channel. At 100 TB each batch costs exactly its own rows'
  * staging + one commit — history never rewrites. */
final class TxLogSink(sqlContext: SQLContext, table: String,
                      partitionCols: Seq[String])
    extends org.apache.spark.sql.execution.streaming.Sink {

  private val spark = sqlContext.sparkSession

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (TxLog.exists(spark, table) &&
        TxLogSink.appliedThrough(spark, table) >= batchId) return
    // the engine hands a streaming-internal frame; re-present its rows
    // as a plain batch plan for the append's stage/commit machinery
    val batch = org.apache.spark.sql.GraftPlanBridge.asBatch(spark, data)
    if (!TxLog.exists(spark, table))
      TxLog.overwrite(batch.limit(0), table, partitionCols)  // schema-only v1
    TxLog.append(batch, table,
      commitTag = Some(s"${TxLogSink.TagPrefix}$batchId"))
  }

  override def toString: String = s"TxLogSink[$table]"
}

object TxLogSink {
  private[streaming] val TagPrefix = "sink-batch:"

  /** Highest batch id a tagged sink append has committed, -1 if none —
    * the read-back side of the exactly-once contract. */
  def appliedThrough(spark: org.apache.spark.sql.SparkSession,
                     table: String): Long =
    TxLog.commitTags(spark, table).flatMap { case (_, t) =>
      if (t.startsWith(TagPrefix)) t.stripPrefix(TagPrefix).toLongOption
      else None
    }.foldLeft(-1L)(math.max)
}

/** The `format("graft-table")` provider (registered in
  * META-INF/services so the short name resolves like any built-in). */
final class TxLogSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table source requires option(\"path\", <txlog table root>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      schema.getOrElse(
        TxLogSource.feedSchema(sqlContext.sparkSession, tablePath(parameters))))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new TxLogSource(sqlContext, tablePath(parameters),
      parameters.get("startVersion").map(_.toLong).getOrElse(1L))

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      "graft-table sink is append-only (an ACID table ingests immutable " +
        "batches; use MERGE/foldChanges for update semantics)")
    new TxLogSink(sqlContext, tablePath(parameters), partitionColumns)
  }
}
