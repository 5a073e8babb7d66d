package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine.
  *
  * The reference applies DQ as a chain of `.filter` calls plus a `count()`
  * per stage (process_data_glue.py:60-93). Here each rule is a named
  * `Column` predicate so that:
  *   - `clean` fuses all rules into one conjunctive filter that Catalyst
  *     pushes into the parquet scan (one pass, predicate pushdown);
  *   - `audit` measures per-rule violation counts in a SINGLE aggregate
  *     pass (map-side partial `sum(when(!p,1))`) instead of one job per
  *     rule — at 100 TB, N extra `count()` actions are N extra scans.
  */
sealed trait DqRule {
  def name: String
  /** True for rows that PASS the rule. */
  def predicate: Column
}

object DqRule {
  /** Column must be non-null. Ref: process_data_glue.py:62,65,68. */
  final case class NotNull(column: String) extends DqRule {
    val name = s"not_null($column)"
    def predicate: Column = col(column).isNotNull
  }
  /** Column must be strictly positive. Ref: passenger_count > 0. */
  final case class Positive(column: String) extends DqRule {
    val name = s"positive($column)"
    def predicate: Column = col(column).isNotNull && col(column) > lit(0)
  }
  /** Column must be non-negative. Ref: total_amount >= 0. */
  final case class NonNegative(column: String) extends DqRule {
    val name = s"non_negative($column)"
    def predicate: Column = col(column).isNotNull && col(column) >= lit(0)
  }
  /** Column must fall in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends DqRule {
    val name = s"in_range($column,$lo,$hi)"
    def predicate: Column =
      col(column).isNotNull && col(column) >= lit(lo) && col(column) <= lit(hi)
  }
  /** Column must be one of the allowed values. */
  final case class InSet(column: String, values: Seq[String]) extends DqRule {
    val name = s"in_set($column)"
    def predicate: Column = col(column).isin(values: _*)
  }
  /** Arbitrary predicate with a label. */
  final case class Custom(name: String, predicate: Column) extends DqRule
}

object DataQuality {

  /** Keep only rows passing ALL rules. Single fused filter → pushdown. */
  def clean(df: DataFrame, rules: Seq[DqRule]): DataFrame =
    if (rules.isEmpty) df
    else df.filter(rules.map(_.predicate).reduce(_ && _))

  /** Rows failing at least one rule, tagged with the failed rule names. */
  def violations(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    val failed = array(rules.map(r =>
      when(!r.predicate || r.predicate.isNull, lit(r.name))): _*)
    df.withColumn("dq_failed_rules", filter(failed, _.isNotNull))
      .filter(size(col("dq_failed_rules")) > 0)
  }

  /** Routes every row to exactly one disposition in ONE scan: `clean`
    * rows pass all rules; `quarantine` rows carry their FIRST failed
    * rule's name in `rule` (`none` for clean rows). The union-of-two-
    * filters form costs a second scan of the input; this is a single
    * projection, so the disposition split pushes one pass through the
    * sink. */
  def dispositions(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    val failed = filter(array(rules.map(r =>
      when(!r.predicate || r.predicate.isNull, lit(r.name))): _*), _.isNotNull)
    df.withColumn("dq_failed_rules", failed)
      .withColumn("rule", coalesce(get(col("dq_failed_rules"), lit(0)), lit("none")))
      .withColumn("disposition",
        when(size(col("dq_failed_rules")) > 0, lit("quarantine"))
          .otherwise(lit("clean")))
      .drop("dq_failed_rules")
  }

  /** One-pass per-rule violation counts + total row count.
    * Output: one row, columns `rows_total` and one `viol_<i>` per rule.
    */
  def audit(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    val aggs = count(lit(1)).as("rows_total") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(!r.predicate || r.predicate.isNull, 1L).otherwise(0L))
          .as(s"viol_$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
