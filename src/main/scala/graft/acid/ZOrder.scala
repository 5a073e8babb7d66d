package graft.acid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping —
  * Delta's `OPTIMIZE ... ZORDER BY (a, b)`.
  *
  * A single-column sort gives perfect min/max file ranges on that column
  * and useless ones on every other; interleaving the bits of per-column
  * QUANTILE-bucket ids gives every Z column a file range ~2^(bits-used/n)
  * of its domain, so a selective predicate on ANY of the n columns skips
  * most files. Quantile buckets (not uniform width) make the curve
  * robust to skew: each bucket holds ~1/2^bits of the rows regardless of
  * the value distribution.
  *
  * Scale shape: the only driver-side state is the bucket boundaries —
  * n × 2^bits doubles from `approxQuantile` (one pass, mergeable
  * sketches); the z-value itself is a literal-driven codegen projection
  * (CASE-chain bucket lookup + shift/or interleave), and the rewrite is
  * `repartitionByRange(z)` + in-partition sort — one shuffle of the
  * rewritten data, same cost as any clustered OPTIMIZE. */
object ZOrder {

  /** Quantile boundaries for ALL z columns in ONE table pass (the
    * multi-column `approxQuantile` overload merges one sketch per column
    * per partition) — round 4 computed them per column, so `ZORDER BY
    * (a, b)` scanned the table twice before the rewrite even started; at
    * 100 TB those extra full reads are the difference between a nightly
    * OPTIMIZE and none. O(cols × 2^bits) doubles of driver metadata. */
  private def boundaries(df: DataFrame, cols: Seq[String],
                         buckets: Int): Seq[Array[Double]] =
    df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .stat.approxQuantile(cols.toArray,
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      .toSeq

  /** Bucket id 0..buckets-1 as a literal CASE chain (whole-stage codegen;
    * no UDF). Nulls sort first (bucket 0), like NULLS FIRST. */
  private def bucketCol(c: String, bs: Array[Double]): Column =
    bs.zipWithIndex.foldRight(lit(bs.length): Column) { case ((b, i), acc) =>
      when(col(c).cast("double") <= b, lit(i)).otherwise(acc)
    }.cast("int")

  /** Morton interleave: bit i of column j lands at z bit `i*n + j`. */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (bc, j) =>
        shiftleft(shiftright(bc, i).bitwiseAND(lit(1)), i * n + j)
      }
    }.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** `df` with a `__z` z-value column for `cols` over `df`'s current
    * distribution. Costs exactly one pass over `df` (the shared
    * quantile sketch).
    *
    * Plan-size discipline (optimization r16): the bucket CASE chains
    * (2^bits-1 WHEN branches per column) land in their OWN projection
    * and the interleave references them as plain attributes. Composing
    * the interleave directly over the bucket Columns re-embedded each
    * chain once per z bit — `bits × cols` textual copies, an ~8k-node
    * expression tree for the default 2-column/8-bit call whose
    * analysis/optimization alone cost seconds of driver time per
    * OPTIMIZE (measured: delta_zorder driver gap 3.7 s of 5.8 s wall).
    * Catalyst's CollapseProject keeps the split (it refuses to inline
    * non-cheap expressions referenced more than once — the exact case
    * here), so the optimizer sees ~500 nodes instead. Per-row work is
    * unchanged: codegen already evaluated each chain once via
    * subexpression elimination; this fixes the DRIVER cost. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.size >= 2, "zorder needs >= 2 columns (use clusterBy for 1)")
    val bs = cols.zip(boundaries(df, cols, 1 << bits)).map { case (c, b) =>
      bucketCol(c, b.map(v => if (v.isNaN) 0.0 else v))
    }
    val bucketed = df.select(df.columns.map(col) ++
      bs.zipWithIndex.map { case (bc, i) => bc.as(s"__zb$i") }: _*)
    bucketed
      .withColumn("__z",
        interleave(bs.indices.map(i => col(s"__zb$i")), bits))
      .drop(bs.indices.map(i => s"__zb$i"): _*)
  }

  /** `df` rewritten in z-order: range-partitioned into ~`nFiles` splits
    * of the z-curve, z-sorted inside each, helper column dropped. */
  def cluster(df: DataFrame, cols: Seq[String], nFiles: Int,
              bits: Int = 8): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
