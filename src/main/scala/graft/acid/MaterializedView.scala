package graft.acid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregate-view definition: `count(*)` plus exact decimal sums per key
  * group. Averages are derivable (`sum / count`) and every maintained
  * column forms an abelian group under addition, which is the property
  * that makes the view maintainable from deltas alone. */
final case class MvSpec(keys: Seq[String], sumCols: Seq[String],
                        countName: String = "n_rows") {
  def sumName(c: String): String = s"sum_$c"
}

/** Incrementally-maintained aggregate table over a [[TxLog]] base table,
  * driven by the change data feed — the pattern that replaces "recompute
  * the rollup over the whole table every batch" with "apply O(changed
  * rows) deltas". At 100 TB a nightly rollup recompute scans 100 TB;
  * a CDF-maintained view reads the day's cdc files and rewrites only the
  * view files whose groups changed (the MERGE is file-granular).
  *
  * Maintenance algebra: every feed row carries a sign — `insert` /
  * `update_postimage` add, `delete` / `update_preimage` subtract — so a
  * per-key aggregation of the feed yields (Δcount, Δsum...) and the view
  * update is one MERGE: matched groups fold the delta in, unmatched
  * groups insert, and groups whose count reaches zero are dropped via
  * the merge's `deleteWhen` clause (one ACID commit, exactly Delta's
  * `WHEN MATCHED [AND cond] THEN UPDATE/DELETE, WHEN NOT MATCHED THEN
  * INSERT`). Sums are DECIMAL(38,6): exact and order-independent, so the
  * incrementally-maintained view is BIT-equal to a full recompute — a
  * floating-point sum would drift with apply order and break the
  * equivalence the spec pins.
  *
  * Consistency contract: the caller threads the returned cursor (first
  * unapplied base version) between calls, exactly like
  * [[graft.streaming.ChangeFeedCursor]]; applying each commit range once
  * keeps view = compute(base) at every cursor position. */
object MaterializedView {
  private val Dec = DecimalType(38, 6)

  /** Full recompute of the view frame from an arbitrary base frame. */
  def compute(base: DataFrame, spec: MvSpec): DataFrame =
    base.groupBy(spec.keys.map(col): _*)
      .agg(count(lit(1)).as(spec.countName),
        spec.sumCols.map(c =>
          sum(col(c).cast(Dec)).cast(Dec).as(spec.sumName(c))): _*)

  /** Initialize `mvTable` from the base table's current snapshot;
    * returns the change-feed cursor to resume from. */
  def initialize(spark: SparkSession, baseTable: String, mvTable: String,
                 spec: MvSpec): Long = {
    val v = TxLog.currentVersion(spark, baseTable)
    TxLog.overwrite(compute(TxLog.read(spark, baseTable), spec), mvTable)
    v + 1
  }

  /** Incremental refresh: fold the base table's change feed
    * `[fromVersion .. current]` into the view with ONE MERGE commit;
    * returns the advanced cursor. Cost is O(changed rows) feed I/O
    * (row-level commits read only their cdc files) plus the view-side
    * copy-on-write of touched group files — the base table is never
    * rescanned. A no-change poll is free (no commit). */
  def refresh(spark: SparkSession, baseTable: String, mvTable: String,
              spec: MvSpec, fromVersion: Long): Long = {
    val current = TxLog.currentVersion(spark, baseTable)
    if (current < fromVersion) return fromVersion
    val changes = TxLog.readChangeFeed(spark, baseTable, fromVersion, Some(current))
    foldChanges(spark, mvTable, spec, changes, appliedThroughHint = current)
    current + 1
  }

  private val TagPrefix = "mv-applied:"

  /** Highest base version the view has folded, read from the tags its
    * own MERGE commits carry — the watermark that makes [[foldChanges]]
    * idempotent under batch replay. -1 before any tagged fold. */
  def appliedThrough(spark: SparkSession, mvTable: String): Long =
    TxLog.commitTags(spark, mvTable).flatMap { case (_, t) =>
      if (t.startsWith(TagPrefix)) t.stripPrefix(TagPrefix).toLongOption
      else None
    }.maxOption.getOrElse(-1L)

  /** Fold one change-feed batch (base versions `.. appliedThroughHint`)
    * into the view as ONE MERGE commit carrying the applied-through
    * watermark as its commit tag — the view state and the consumer
    * checkpoint move in the SAME atomic commit, so a replayed batch
    * (crash between the merge and any external cursor persist) is
    * detected by the watermark and becomes a no-op instead of a
    * double-apply. The maintenance algebra is #77's: signed per-key
    * deltas in exact DECIMAL, one MERGE with `deleteWhen` dropping
    * emptied groups. */
  def foldChanges(spark: SparkSession, mvTable: String, spec: MvSpec,
                  changes: DataFrame, appliedThroughHint: Long): Unit = {
    if (appliedThrough(spark, mvTable) >= appliedThroughHint) return // replay
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = changes.groupBy(spec.keys.map(col): _*)
      .agg(sum(sign).as("__d_cnt"),
        spec.sumCols.map(c =>
          sum(col(c).cast(Dec) * sign).cast(Dec).as(s"__d_$c")): _*)
      // groups whose contributions net to zero would rewrite view files
      // for nothing — drop them before the merge's touched-file probe
      .filter(spec.sumCols.map(c => col(s"__d_$c") =!= lit(0).cast(Dec))
        .foldLeft(col("__d_cnt") =!= 0L)(_ || _))
    val src = delta.join(TxLog.read(spark, mvTable), spec.keys, "left")
      .select(spec.keys.map(col) ++
        Seq((coalesce(col(spec.countName), lit(0L)) + col("__d_cnt"))
          .as(spec.countName)) ++
        spec.sumCols.map(c =>
          (coalesce(col(spec.sumName(c)), lit(0).cast(Dec)) +
            coalesce(col(s"__d_$c"), lit(0).cast(Dec))).cast(Dec)
            .as(spec.sumName(c))): _*)
    TxLog.merge(src, mvTable, spec.keys,
      deleteWhen = Some(col(spec.countName) === 0L),
      commitTag = Some(s"$TagPrefix$appliedThroughHint"))
  }
}
