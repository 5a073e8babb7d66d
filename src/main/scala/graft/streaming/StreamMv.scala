package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.acid.{MaterializedView, MvSpec}

/** The STREAMING face of the incrementally-maintained view (#77): the
  * [[ChangeFeedCursor]] tails the base table's commit log and every
  * polled batch folds into the view through
  * [[MaterializedView.foldChanges]] — the continuous-query shape
  * (`foreachBatch`-style: one MERGE per feed batch), with the SAME fold
  * body the batch `refresh` uses, so the two faces cannot drift.
  *
  * Exactly-once under cursor replay (the stream_dedup_incremental
  * discipline): the fold's MERGE commit carries the applied-through base
  * version as its commit TAG — view state and consumer watermark move in
  * ONE atomic commit. The two crash windows both converge:
  *  - crash AFTER the merge, BEFORE the external cursor persists: the
  *    restarted cursor re-polls the same version range; `foldChanges`
  *    sees the view's watermark already at the batch's high version and
  *    no-ops instead of double-applying;
  *  - crash BEFORE the merge: nothing committed, the replayed batch
  *    applies as if first-delivered (a feed batch is a pure function of
  *    the closed version range, so the re-read is bit-identical).
  * At 100 TB each batch costs O(changed rows) feed I/O plus the
  * copy-on-write of the view files whose groups changed — the base table
  * is never rescanned, however long the stream runs. */
object StreamMv {

  /** Drain everything the cursor has not yet delivered, folding one
    * batch per poll; returns the number of batches applied.
    *
    * The cursor is CLAMPED to the view's own watermark before each poll:
    * a restarted cursor re-opened at a stale checkpoint would otherwise
    * widen its batch to the CURRENT head — and if new base commits
    * landed between the crash and the replay, `foldChanges`'
    * all-or-nothing watermark check sees hint > watermark, passes, and
    * the already-folded prefix of the range double-applies. Clamping
    * makes the replayed poll start exactly at the first unapplied
    * version, so the batch contains only new work regardless of what
    * committed in the crash window. */
  def pump(spark: SparkSession, baseTable: String, mvTable: String,
           spec: MvSpec, cursor: ChangeFeedCursor): Int = {
    var applied = 0
    var more = true
    while (more) {
      cursor.nextVersion = math.max(cursor.nextVersion,
        MaterializedView.appliedThrough(spark, mvTable) + 1)
      cursor.poll() match {
        case Some((_, hi, changes)) =>
          MaterializedView.foldChanges(spark, mvTable, spec, changes, hi)
          applied += 1
        case None => more = false
      }
    }
    applied
  }
}
