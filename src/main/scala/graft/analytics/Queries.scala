package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** General analytics surface over the star schema — the query families a
  * user of the reference's Athena layer would run, expressed as Catalyst
  * plans.
  *
  * Scale notes (100 TB):
  *  - Dimension tables (region/nation/supplier/part/customer) are tiny
  *    relative to the facts → explicit `broadcast()` so the fact table is
  *    never shuffled for these joins. AQE would usually infer this, but at
  *    cluster scale an explicit hint removes the dependence on stats.
  *  - Aggregates are algebraic (sum/avg/count) → map-side partials; the
  *    only shuffle is on the (low-cardinality) group keys.
  *  - Window queries shuffle once on the partition key; the sort within
  *    partitions rides that shuffle's sort.
  *  - Top-k per group uses a rank window rather than a global sort; global
  *    top-k uses orderBy+limit which Spark executes as TakeOrderedAndProject
  *    (per-partition heaps, no full sort).
  */
object Queries {

  /** #10 TPC-H Q1-shaped pricing summary. Doubles are rounded only at the
    * report edge. */
  def aggPricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** #11 Top-10 customers by order revenue (fact⋈broadcast dim → agg →
    * global top-k via TakeOrderedAndProject). */
  def joinTopCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)

  /** #12 Revenue per nation: 4 broadcast dims + 2 facts, one fact shuffle. */
  def joinRevenueNation(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")

  /** #13 Semi/anti join: customers with vs without open ('O') orders. */
  def joinSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val openOrders = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
    val c = Tables.customer(s, dir)
    val withO = c.join(openOrders, col("c_custkey") === col("o_custkey"), "left_semi")
    val without = c.join(openOrders, col("c_custkey") === col("o_custkey"), "left_anti")
    withO.agg(count(lit(1)).as("n_with_open"))
      .crossJoin(without.agg(count(lit(1)).as("n_without_open")))
  }

  /** #14 Running sum + row_number per supplier ordered by ship date
    * (deterministic tiebreak on orderkey, linenumber). */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).cast("long").as("rn"),
        round(sum(col("l_quantity"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_qty"))
      .orderBy("l_suppkey", "rn")
  }

  /** #15 Top-3 parts by retail price per brand (rank window, tiebreak on
    * partkey). */
  def windowTopkGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).cast("long").as("price_rank"))
      .filter(col("price_rank") <= 3)
      .orderBy("p_brand", "price_rank")
  }

  /** #16 Gap-based sessionization (30-min inactivity): lag → new-session
    * flag → cumulative sum as session id. Gap math in integer µs on both
    * engine and oracle to avoid seconds-truncation drift. */
  def windowSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        (col("prev_us").isNull ||
          (unix_micros(col("ts")) - col("prev_us") > gapUs)).cast("long"))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** #17 ROLLUP over order status × priority (group keys coalesced to
    * 'ALL' so the subtotal rows are unambiguous and sort-stable). */
  def rollupPriority(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n_orders"), col("total_price"))
      .orderBy("o_orderstatus", "o_orderpriority")

  /** #18 Exact distinct counts (one row). Approximate variants live in
    * `distinctApprox` (rows-only check — sketch values are
    * implementation-specific). */
  def distinctCount(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))

  /** HLL-sketch distinct (rows-only: estimator internals differ across
    * engines by design). rsd 1% keeps the estimate within ±3% of exact. */
  def distinctApprox(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))

  /** #37 Exact interpolated quantiles (median + p90) per group. */
  def aggQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(round(median(col("value")), 4).as("med_value"),
           round(percentile(col("value"), lit(0.9)), 4).as("p90_value"),
           count(lit(1)).as("n"))
      .orderBy("event_type")

  /** #38 Left outer join with null-aware counting: suppliers per nation
    * including supplier-less nations (count(col) skips nulls). */
  def joinOuter(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(Tables.supplier(s, dir),
        col("n_nationkey") === col("s_nationkey"), "left")
      .groupBy("n_name")
      .agg(count(col("s_suppkey")).as("n_suppliers"))
      .orderBy("n_name")

  /** #39 Set operations (distinct semantics, matching SQL
    * INTERSECT/EXCEPT/UNION). */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val high = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
    open.intersect(high).agg(count(lit(1)).as("n_both"))
      .crossJoin(open.except(high).agg(count(lit(1)).as("n_only_open")))
      .crossJoin(open.union(high).distinct().agg(count(lit(1)).as("n_either")))
  }
}
