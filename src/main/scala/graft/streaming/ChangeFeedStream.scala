package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.acid.TxLog

/** Incremental consumption of the txlog change feed — the "readStream
  * from a Delta table" shape: tail the commit log, deliver each commit's
  * row-level changes exactly once, in commit order.
  *
  * A micro-batch is the half-open range of commits that landed since the
  * last poll; the cursor advances only when a batch is handed out.
  * Exactly-once protocol under crashes: persist `nextVersion` AFTER the
  * batch's output lands (atomically with it, or to an idempotent/
  * overwrite sink). A crash before the persist re-opens at the old
  * checkpoint and re-delivers the SAME batch — deterministic, because a
  * batch is a closed version range over an append-only log, so
  * `readChangeFeed(lo, Some(hi))` is a pure function of the log — and a
  * crash after the persist skips it entirely. No delivery is ever lost
  * and no persisted delivery ever repeats (spec-proven across a
  * simulated crash on both sides of the persist). Cost per poll is one log listing plus the
  * change files of NEW commits only — at 100 TB a CDC consumer tailing a
  * busy table reads O(changed rows) per batch, never a table scan. The
  * feed inherits [[TxLog.readChangeFeed]]'s classification: merges and
  * row-level ops read their cdc files, appends read their add files,
  * optimize/compaction commits contribute nothing (no false churn).
  */
final class ChangeFeedCursor(spark: SparkSession, table: String,
                             startVersion: Long) {

  /** The next version this cursor will deliver — persist this as the
    * consumer checkpoint. */
  @volatile var nextVersion: Long = startVersion

  /** Changes committed since the last poll, as
    * `(firstVersion, lastVersion, changes)`; None when nothing new.
    * Advances the cursor past `lastVersion`. */
  def poll(): Option[(Long, Long, DataFrame)] = {
    val current = TxLog.currentVersion(spark, table)
    if (current < nextVersion) None
    else {
      val lo = nextVersion
      nextVersion = current + 1
      Some((lo, current, TxLog.readChangeFeed(spark, table, lo, Some(current))))
    }
  }
}

object ChangeFeedStream {

  /** Open a cursor at `startVersion` (e.g. `currentVersion + 1` for
    * changes-from-now, or an old version for a backfill-then-follow). */
  def cursor(spark: SparkSession, table: String,
             startVersion: Long): ChangeFeedCursor =
    new ChangeFeedCursor(spark, table, startVersion)
}
