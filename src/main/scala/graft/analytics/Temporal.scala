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
}
