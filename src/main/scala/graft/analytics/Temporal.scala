package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from
  * existing operators (preference tier (a) — no custom physical plan
  * needed).
  */
object Temporal {

  /** Backward as-of join: for each left row, attach the `carry` columns of
    * the LATEST right row with `right.ts <= left.ts` for the same `key`
    * (inclusive; left rows with no prior right row get NULLs).
    *
    * Shape: tag + unionByName + running `last(ignoreNulls)` window,
    * filter back to left rows. ONE shuffle (by key) and a per-key sort —
    * the same cost as a sort-merge join, with no custom operator. Right
    * rows sort before left rows at equal timestamps, making the match
    * inclusive like SQL `ASOF JOIN ... ON l.ts >= r.ts`.
    *
    * `right` must contain `key`, `ts`, and the `carry` columns; `carry`
    * names must not collide with left columns. */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   ts: String, carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "asofBackward needs at least one carried column")
    require(carry.forall(right.columns.contains), s"right side must contain $carry")
    require(carry.forall(!left.columns.contains(_)), s"carry $carry collide with left")
    val l = left.withColumn("_is_left", lit(1))
    val r = right.select((Seq(col(key), col(ts)) ++ carry.map(col)): _*)
      .withColumn("_is_left", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carry.foldLeft(u) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .filter(col("_is_left") === 1)
      .drop("_is_left")
  }

  /** Daily resample with gap fill — the time-series normalization every
    * downstream model wants: one row per (key, day) over each key's
    * active span, zero-filled counts/sums on gap days and the last
    * observed `value` carried forward.
    *
    * Shape: one groupBy to daily grain, a per-key min/max span, the day
    * grid via `sequence` + `explode` (distributed per key — no driver
    * loop, no cross join against a calendar table), a left join back on
    * (key, day), and a running `last(ignoreNulls)` window for the
    * forward fill. Shuffles are all on the key (AQE coalesces the tiny
    * span side); grid size is active-span-bounded per key, so a 100 TB
    * events table resamples to O(keys × days) rows regardless of event
    * volume. Ties within a day resolve by latest `ts` (unique per key in
    * this dataset; compose a sequence column into `ts` if not). */
  def resampleDaily(events: DataFrame, key: String, ts: String,
                    value: String): DataFrame = {
    val daily = events
      .groupBy(col(key), to_date(col(ts)).as("day"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col(value)), 2).as("day_total"),
           max_by(col(value), col(ts)).as("day_last"))
    val grid = daily.groupBy(col(key))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(key), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(key, "day"), "left")
      .select(col(key), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("day_total"), lit(0.0)).as("day_total"),
        last(col("day_last"), ignoreNulls = true).over(w).as("last_seen_value"))
  }
}
