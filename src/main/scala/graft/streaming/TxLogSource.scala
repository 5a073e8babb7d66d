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
  * Admission control (round 12, the Delta
  * `maxFilesPerTrigger`/`maxBytesPerTrigger` discipline): an unbounded
  * `getOffset` would hand a restarted or backlogged consumer ONE
  * catch-up micro-batch spanning every pending commit — at 100 TB an
  * unbounded batch (memory, shuffle, checkpoint latency).
  * `maxCommitsPerTrigger` caps how many commits one batch may span;
  * `maxRowsPerTrigger` and `maxBytesPerTrigger` (round 13 — rows
  * mis-proxy wide/blob rows, exactly the multimodal tables this engine
  * carries) cap the batch's DELIVERED volume, budgeted from log
  * metadata alone ([[graft.acid.TxLog.commitOps]]: cdc actions carry
  * their own row/byte counts, so a delete-only commit — ~0 added rows,
  * a huge change set — is budgeted by what the feed will actually read;
  * maintenance commits count 0 and deliver nothing). All caps always
  * admit at least one commit per batch, so a stream never starves
  * behind one oversized commit; a backlog drains in bounded steps, each
  * an ordinary exactly-once batch. The source tracks the highest
  * version it has PLANNED in-memory and re-arms it from the engine's
  * own restart protocol (the engine replays `getBatch` over the
  * checkpointed range before the first `getOffset` of a restarted
  * query — the Kafka-source contract), so bounded catch-up survives
  * restarts without a side checkpoint.
  *
  * Options: `path` (table root, required), `startVersion` (first commit
  * to deliver; default 1 = full history — commit 1 is the first commit
  * carrying data in every writer path here), `maxCommitsPerTrigger`,
  * `maxRowsPerTrigger`, `maxBytesPerTrigger` (admission caps, all
  * optional = unbounded).
  */
final class TxLogSource(sqlContext: SQLContext, table: String,
                        startVersion: Long,
                        maxCommitsPerTrigger: Option[Int] = None,
                        maxRowsPerTrigger: Option[Long] = None,
                        maxBytesPerTrigger: Option[Long] = None) extends Source {

  maxCommitsPerTrigger.foreach(c => require(c >= 1,
    s"maxCommitsPerTrigger must be >= 1, got $c"))
  maxRowsPerTrigger.foreach(r => require(r >= 1,
    s"maxRowsPerTrigger must be >= 1, got $r"))
  maxBytesPerTrigger.foreach(b => require(b >= 1,
    s"maxBytesPerTrigger must be >= 1, got $b"))

  private val spark = sqlContext.sparkSession

  /** Highest commit version this source has handed to the engine — as a
    * planned offset OR as a replayed `getBatch` end (the engine replays
    * the checkpointed range on restart before polling again, which
    * re-arms this watermark; see class doc). Admission advances getOffset
    * from here, never from the log head. */
  @volatile private var planned: Long = startVersion - 1

  override val schema: StructType = TxLogSource.feedSchema(spark, table)

  /** Next target offset: the latest committed version, clamped to the
    * admission caps relative to what is already planned — null
    * (no batch) until the table reaches `startVersion`. */
  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] = {
    val current = TxLog.currentVersion(spark, table)
    if (current < startVersion) return None
    val base = math.max(planned, startVersion - 1)
    if (current <= base) {
      // nothing new beyond what is planned; report the planned offset so
      // the engine sees "no change" (never regress below its checkpoint)
      return if (base >= startVersion) Some(LongOffset(base)) else None
    }
    var hi = current
    maxCommitsPerTrigger.foreach(mc => hi = math.min(hi, base + mc))
    if (maxRowsPerTrigger.isDefined || maxBytesPerTrigger.isDefined) {
      // admit commits in order while the cumulative admitted DELIVERED
      // volume (cdc-aware rows/bytes) stays under every cap; always at
      // least one (Delta's at-least-one-file rule). One metadata read
      // budgets both caps.
      val ops = TxLog.commitOps(spark, table, base + 1, hi)
      var accRows = 0L
      var accBytes = 0L
      var last = base
      ops.foreach { m =>
        if (last == base ||
            (maxRowsPerTrigger.forall(accRows < _) &&
             maxBytesPerTrigger.forall(accBytes < _))) {
          accRows += m.rows; accBytes += m.bytes; last = m.version
        }
      }
      hi = last
    }
    planned = math.max(planned, hi)
    Some(LongOffset(hi))
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
    // restart re-arm: a replayed checkpointed range tells us everything
    // ≤ hi was already planned by a previous incarnation
    planned = math.max(planned, hi)
    // re-ordered to the declared schema: readChangeFeed appends the CDF
    // columns, but a restarted query compares schemas structurally.
    // Declared columns ABSENT from the range's feed back-fill as typed
    // NULLs (round 12): the feed presents each commit range's
    // as-of-version schema, so after a restart that resolved a WIDENED
    // table schema (a schema-evolving merge landed in the crash
    // window), the engine's recovery replay of the PRE-evolution range
    // must still project the current schema — the same typed-NULL
    // completion TxLog.read applies to pre-evolution data files.
    val feed = TxLog.readChangeFeed(spark, table, lo, Some(hi))
    val present = feed.columns.toSet
    val batch = feed.select(schema.fields.map { f =>
      if (present(f.name)) org.apache.spark.sql.functions.col(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
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
    * RELAXING, never narrowing. Resolved once at source creation; a
    * column a mid-stream additive evolution appends becomes visible on
    * the next RESTART (round 12 — the Delta restart-with-new-schema
    * contract: the restarted source resolves the widened schema and
    * getBatch back-fills typed NULLs when replaying pre-evolution
    * ranges; spec-pinned). Non-additive changes surface loudly at the
    * consumer's plan/sink. */
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
  * Exactly-once across restarts, keyed BY QUERY (round 12 — the Delta
  * `(txnAppId, version)` idempotency shape): the tag carries a query
  * scope (`queryId` option, else a checkpoint-location hash), so a
  * SECOND streaming query writing the same table — whose batch ids
  * also start at 0 — is a separate transaction stream, not a set of
  * ids to silently skip. Within a scope, the engine re-offers a batch
  * whose sink write it cannot prove completed; [[addBatch]] skips a
  * re-offer of exactly the applied watermark batch, and REFUSES
  * (loudly) a batch id BELOW it — that shape means the checkpoint was
  * reset/lost while the table kept a newer applied batch, and skipping
  * would be silent data loss.
  *
  * The applied watermark is read from the commit tags ONCE per sink
  * instance and cached (addBatch calls are serialized per query —
  * the engine's contract), so a long-running ingest pays O(1) driver
  * log work per batch, not O(commit history); a restart's fresh sink
  * instance re-reads once. First batch bootstraps the table (schema
  * from the stream, sink-declared partition columns) as an empty v1
  * overwrite + tagged append, so `create-if-absent` needs no side
  * channel. At 100 TB each batch costs exactly its own rows' staging +
  * one commit — history never rewrites.
  *
  * SMALL-FILE LIFECYCLE (round 13 — the Delta auto-compaction
  * discipline): one append per micro-batch FOREVER is ~1,440 small
  * files/day at a trigger per minute, plus an ever-growing log tail —
  * the first thing a production ingest hits after a week. Every
  * `maintenanceEvery` committed batches (option, default 50; 0
  * disables) the sink runs [[graft.acid.TxLog.compactSmallFiles]]
  * (files < `maintenanceMaxFileBytes`, default 32 MB — O(small files)
  * work, never O(table)) and writes a log CHECKPOINT, so live file
  * count and log-replay cost stay bounded however long the query runs.
  * The maintenance commit is an ordinary `optimize`: it carries no
  * sink-batch tag (exactly-once replay unaffected), contributes
  * nothing to the change feed, and counts zero toward a downstream
  * `stream_table` reader's admission caps — a concurrent consumer sees
  * no phantom rows. */
final class TxLogSink(sqlContext: SQLContext, table: String,
                      partitionCols: Seq[String], scope: String,
                      maintenanceEvery: Int = 50,
                      maintenanceMaxFileBytes: Long = 32L * 1024 * 1024)
    extends org.apache.spark.sql.execution.streaming.Sink {

  require(maintenanceEvery >= 0,
    s"maintenanceEvery must be >= 0 (0 disables), got $maintenanceEvery")

  private val spark = sqlContext.sparkSession

  /** Cached applied watermark: None = not yet read from the log. */
  private var highWater: Option[Long] = None

  /** Batches committed by THIS instance since its last maintenance —
    * cadence is per-process on purpose (a restart resets it; the cycle
    * is a rate limiter, not an exactness contract). */
  private var sinceMaintenance: Int = 0

  /** Maintenance cycles this instance has run that actually compacted
    * (spec/probe observability). */
  private[graft] val maintenanceRuns = new java.util.concurrent.atomic.AtomicLong

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val applied = highWater.getOrElse {
      val a = if (TxLog.exists(spark, table))
        TxLogSink.appliedThrough(spark, table, scope) else -1L
      highWater = Some(a)
      a
    }
    if (batchId <= applied) {
      // the one legal re-offer is exactly the applied watermark (a crash
      // between the sink's commit and the engine's own bookkeeping);
      // anything below it means the checkpoint regressed under a live
      // table — refuse rather than silently drop the batch
      require(batchId == applied,
        s"graft-table sink: batch $batchId re-offered below the applied " +
          s"watermark $applied for query scope '$scope' on $table — the " +
          "checkpoint was reset or lost while the table retains newer " +
          "applied batches; restart with a fresh queryId (or checkpoint " +
          "location) to ingest as a new stream instead of silently skipping")
      return
    }
    // the engine hands a streaming-internal frame; re-present its rows
    // as a plain batch plan for the append's stage/commit machinery
    val batch = org.apache.spark.sql.GraftPlanBridge.asBatch(spark, data)
    if (!TxLog.exists(spark, table))
      TxLog.overwrite(batch.limit(0), table, partitionCols)  // schema-only v1
    TxLog.append(batch, table,
      commitTag = Some(s"${TxLogSink.TagPrefix}$scope:$batchId"))
    highWater = Some(batchId)
    if (maintenanceEvery > 0) {
      sinceMaintenance += 1
      if (sinceMaintenance >= maintenanceEvery) {
        sinceMaintenance = 0
        val stats = TxLog.compactSmallFiles(spark, table,
          maxFileBytes = maintenanceMaxFileBytes)
        // checkpoint regardless: it bounds log REPLAY even when nothing
        // qualified for compaction (idempotent at a version)
        TxLog.checkpoint(spark, table)
        if (stats.filesRewritten > 0) maintenanceRuns.incrementAndGet()
      }
    }
  }

  override def toString: String = s"TxLogSink[$table, scope=$scope]"
}

object TxLogSink {
  private[streaming] val TagPrefix = "sink-batch:"

  /** Driver log listings [[appliedThrough]] has performed — spec-level
    * observability for the O(1)-per-batch read-back contract. */
  private[graft] val logListings = new java.util.concurrent.atomic.AtomicLong

  /** Highest batch id a tagged sink append has committed FOR `scope`,
    * -1 if none — the read-back side of the exactly-once contract.
    * Tags of other scopes (other queries writing the same table) are
    * invisible by construction. */
  def appliedThrough(spark: org.apache.spark.sql.SparkSession,
                     table: String, scope: String): Long = {
    logListings.incrementAndGet()
    val prefix = s"$TagPrefix$scope:"
    TxLog.commitTags(spark, table).flatMap { case (_, t) =>
      if (t.startsWith(prefix)) t.stripPrefix(prefix).toLongOption
      else None
    }.foldLeft(-1L)(math.max)
  }

  /** The query scope a writeStream's options resolve to: an explicit
    * `queryId` option, else a hash of the checkpoint location (stable
    * across restarts of the same query — the identity Delta derives
    * from `txnAppId`), else a fixed scope for checkpoint-less ad-hoc
    * writes. */
  def scopeFor(parameters: Map[String, String]): String = {
    def opt(k: String) = parameters.collectFirst {
      case (key, v) if key.equalsIgnoreCase(k) => v
    }
    opt("queryId").getOrElse {
      opt("checkpointLocation") match {
        case Some(ckpt) =>
          val h = scala.util.hashing.MurmurHash3.stringHash(ckpt)
          f"ckpt-${h & 0xffffffffL}%08x"
        case None => "default"
      }
    }
  }
}

/** The `format("graft-table")` provider (registered in
  * META-INF/services so the short name resolves like any built-in). */
final class TxLogSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def opt(parameters: Map[String, String], k: String): Option[String] =
    parameters.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }

  private def tablePath(parameters: Map[String, String]): String =
    opt(parameters, "path").getOrElse(throw new IllegalArgumentException(
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
      opt(parameters, "startVersion").map(_.toLong).getOrElse(1L),
      opt(parameters, "maxCommitsPerTrigger").map(_.toInt),
      opt(parameters, "maxRowsPerTrigger").map(_.toLong),
      opt(parameters, "maxBytesPerTrigger").map(_.toLong))

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      "graft-table sink is append-only (an ACID table ingests immutable " +
        "batches; use MERGE/foldChanges for update semantics)")
    new TxLogSink(sqlContext, tablePath(parameters), partitionColumns,
      TxLogSink.scopeFor(parameters),
      opt(parameters, "maintenanceEvery").map(_.toInt).getOrElse(50),
      opt(parameters, "maintenanceMaxFileBytes").map(_.toLong)
        .getOrElse(32L * 1024 * 1024))
  }
}
