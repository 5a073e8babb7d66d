package graft.acid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance on a [[TxLog]] table —
  * the pattern CDC pipelines build the moment they have conditional
  * MERGE ([[TxLog.mergeConditional]]): instead of overwriting a changed
  * dimension row, the current version is CLOSED (`valid_to` stamped,
  * `is_current` dropped) and a new version INSERTED, so every fact can
  * join the dimension AS OF its own event time.
  *
  * Table contract: `keyCols ++ attrCols ++ (valid_from, valid_to,
  * is_current)`; the natural primary key of a versioned dimension is
  * `(key, valid_from)` — and that is exactly the merge key here, which
  * is what lets one batch close old versions AND insert their
  * successors in a SINGLE atomic MERGE commit (no NULL-merge-key
  * staging trick, no two-commit window where the dimension has no
  * current row): a close row carries the OPEN version's `valid_from`
  * (matches → update), its successor carries `batchTs` as `valid_from`
  * (cannot match any existing version — `batchTs` is required to be
  * newer than every open `valid_from`).
  *
  * Scale shape: change detection is one join of the batch against the
  * CURRENT slice of the dimension (`is_current` — predicate-pushed to
  * the scan); the merge itself is [[TxLog.mergeConditional]]'s
  * file-granular copy-on-write, touching only files holding a closed
  * version's key. Nothing is O(history).
  */
object Scd2 {

  /** Initial load: every batch row becomes the open version. */
  def initialize(batch: DataFrame, table: String, keyCols: Seq[String],
                 attrCols: Seq[String], batchTs: String,
                 partitionCols: Seq[String] = Seq.empty): Unit =
    TxLog.overwrite(
      batch.select((keyCols ++ attrCols).map(col): _*)
        .withColumn("valid_from", lit(batchTs).cast("timestamp"))
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true)),
      table, partitionCols)

  /** Apply one batch of (key, attrs) at `batchTs`. Unchanged rows
    * no-op; changed keys close + re-version; unseen keys insert their
    * first version. Returns the number of (closed, inserted) rows. */
  def apply(spark: SparkSession, batch: DataFrame, table: String,
            keyCols: Seq[String], attrCols: Seq[String],
            batchTs: String): (Long, Long) = {
    import MergeClause._
    val cur = TxLog.read(spark, table).filter(col("is_current"))
      .select((keyCols.map(c => col(c)) :+ col("valid_from").as("__cur_vf"))
        ++ attrCols.map(c => col(c).as(s"__cur_$c")): _*)
    val b = batch.select((keyCols ++ attrCols).map(col): _*)
    val joined = b.join(cur, keyCols, "left")
    // null-safe attr comparison: a NULL->value or value->NULL transition
    // is a change; NULL<=>NULL is not
    val changed = attrCols.map(c => !(col(c) <=> col(s"__cur_$c")))
      .reduce(_ || _)
    val isNew = col("__cur_vf").isNull
    val ts = lit(batchTs).cast("timestamp")
    val openVf = joined.agg(max(col("__cur_vf"))).first()
    require(openVf.isNullAt(0) ||
      openVf.getTimestamp(0).before(java.sql.Timestamp.valueOf(batchTs)),
      s"batchTs $batchTs is not after every open valid_from " +
      s"(${openVf.get(0)}) — SCD-2 batches must apply in time order")
    val closes = joined.filter(!isNew && changed)
      .select((keyCols.map(col) :+ col("__cur_vf").as("valid_from")) ++
        attrCols.map(c => col(s"__cur_$c").as(c)): _*)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val inserts = joined.filter(isNew || changed)
      .select((keyCols ++ attrCols).map(col): _*)
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val staged = closes.unionByName(inserts)
    val nCloses = closes.count()
    val nInserts = inserts.count()
    if (nCloses + nInserts > 0)
      TxLog.mergeConditional(staged, table, keyCols :+ "valid_from", Seq(
        // the matched rows are exactly the versions being closed (their
        // (key, valid_from) came from the open slice); the guard keeps a
        // replayed batch from re-closing an already-closed version
        MatchedUpdate(Some("t.is_current"),
          Map("valid_to" -> s"cast('$batchTs' as timestamp)",
              "is_current" -> "false")),
        NotMatchedInsert(None)))
    (nCloses, nInserts)
  }

  /** The dimension as of `ts` — the join face consumers use. */
  def asOf(spark: SparkSession, table: String, ts: String): DataFrame = {
    val t = lit(ts).cast("timestamp")
    TxLog.read(spark, table)
      .filter(col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
  }
}
