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
    * batch per poll; returns the number of batches applied. */
  def pump(spark: SparkSession, baseTable: String, mvTable: String,
           spec: MvSpec, cursor: ChangeFeedCursor): Int = {
    var applied = 0
    var more = true
    while (more) {
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
