package graft.acid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generated partition columns (Delta GENERATED ALWAYS AS): a partition
  * column DERIVED from a data column by a declared, MONOTONE expression,
  * so the reader can turn predicates on the data column into partition
  * predicates — the feature that makes `WHERE ts BETWEEN a AND b` prune a
  * date-partitioned 100 TB table without the query ever mentioning the
  * partition column ([[graft.plans.GeneratedPartitionFilters]] is the
  * optimizer rule that does the derivation).
  *
  * Spec grammar is deliberately tiny — `date(<srcCol>)` and
  * `year(<srcCol>)` — because the derivation is only SOUND for
  * expressions monotone in the source (Delta similarly limits partition
  * filter generation to an allow-list of expression shapes: DATE
  * truncation, year/month extraction, substring prefixes). `month(ts)`
  * alone is NOT here: month wraps across years, so `ts >= L` implies
  * nothing about `month(ts)`.
  *
  * Write side: [[TxLog.overwrite]]/[[TxLog.append]] COMPUTE a missing
  * generated column from its source (so writers never hand-maintain it)
  * and REJECT a provided column that disagrees with the generation
  * expression (a wrong hand-written value would silently corrupt
  * pruning: the row would live in a partition its own timestamp
  * contradicts, and the derived filter would skip it).
  */
private[graft] object GeneratedCols {

  private val Pattern = "^(date|year)\\(([A-Za-z0-9_]+)\\)$".r

  /** spec → (kind, srcCol); loud on anything outside the grammar. */
  def parse(spec: String): (String, String) = spec match {
    case Pattern(kind, src) => (kind, src)
    case other => throw new IllegalArgumentException(
      s"unsupported generated-column spec '$other': expected date(<col>) " +
      "or year(<col>) — only expressions monotone in their source are " +
      "sound to derive partition filters from")
  }

  def exprFor(spec: String): Column = parse(spec) match {
    case ("date", src) => to_date(col(src))
    case ("year", src) => year(col(src))
    case _ => throw new IllegalStateException("unreachable")
  }

  /** Compute missing generated columns; verify provided ones match their
    * generation expression (one count job over the mismatches). */
  def applyTo(df: DataFrame, generated: Map[String, String]): DataFrame =
    generated.foldLeft(df) { case (d, (pcol, spec)) =>
      if (!d.columns.contains(pcol)) d.withColumn(pcol, exprFor(spec))
      else {
        val bad = d.filter(!(col(pcol) <=> exprFor(spec))).limit(1).count()
        require(bad == 0L,
          s"generated column $pcol carries values that disagree with " +
          s"'$spec' — a mispartitioned row would be invisibly skipped by " +
          "derived partition filters; drop the column and let the write " +
          "compute it")
        d
      }
    }
}
