package graft.plans

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.acid.TxLogFileIndex

/** Partition-filter derivation for GENERATED partition columns (the
  * read half of Delta's GENERATED ALWAYS AS; the write half is
  * [[graft.acid.GeneratedCols]]): a query that filters only on the DATA
  * column — `WHERE ts BETWEEN a AND b` on a table partitioned by the
  * generated `event_date = date(ts)` — gets the implied PARTITION
  * predicate conjoined by this optimizer rule, so partition pruning
  * fires for queries that never mention the partition column. At 100 TB
  * this is the difference between evaluating per-partition-group
  * metadata (thousands of groups) and per-file stat ranges (millions of
  * files) — and it keeps pruning when file stats are absent entirely
  * (legacy adds, stat-less columns).
  *
  * Soundness: only derivations through expressions MONOTONE in the
  * source are emitted —
  *   `ts >= L`  ⇒  `g(ts) >= g(L)`   (>, >= both weaken to >=)
  *   `ts <= U`  ⇒  `g(ts) <= g(U)`   (<, <= both weaken to <=)
  *   `ts = v`   ⇒  `g(ts) = g(v)`
  * for g ∈ {date, year} ([[graft.acid.GeneratedCols]] rejects anything
  * else at declaration time). The derived conjunct is a WEAKENING of
  * the original (every row satisfying the data predicate satisfies it),
  * so results are provably unchanged; the original predicate still
  * evaluates row-level.
  *
  * Timezone: `date(ts)`/`year(ts)` are computed by the WRITE side with
  * the session timezone; the rule folds the literal with the SAME
  * clock only when the session zone is UTC (this library pins UTC
  * everywhere) and derives nothing otherwise — a mismatched zone would
  * shift day boundaries and prune rows that exist.
  *
  * Runs in `spark.experimental.extraOptimizations` (after the main
  * batches, so pushed-down filters sit directly on the relation) and is
  * idempotent: a conjunct already present semantically is not re-added,
  * which is also what lets the fixed-point batch terminate.
  */
object GeneratedPartitionFilters extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, lr: LogicalRelation) =>
      lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: TxLogFileIndex if idx.generated.nonEmpty &&
              conf.sessionLocalTimeZone == "UTC" =>
            val derived = deriveAll(cond, lr.output, idx.generated)
            if (derived.isEmpty) f
            else Filter(derived.foldLeft(cond)(And), lr)
          case _ => f
        }
        case _ => f
      }
  }

  private def deriveAll(cond: Expression, output: Seq[Attribute],
                        generated: Map[String, (String, String)]): Seq[Expression] = {
    val conjuncts = splitConjuncts(cond)
    generated.toSeq.sortBy(_._1).flatMap { case (pcol, (kind, src)) =>
      output.find(_.name == pcol).toSeq.flatMap { pAttr =>
        conjuncts.flatMap(derive(_, kind, src, pAttr))
      }
    }.filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      .distinct
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** One data-column comparison → the weakened partition comparison. */
  private def derive(c: Expression, kind: String, src: String,
                     pAttr: Attribute): Option[Expression] = {
    def g(micros: Long): Option[Literal] = genLiteral(kind, micros)
    c match {
      case GreaterThanOrEqual(a: AttributeReference, TsLit(v)) if a.name == src =>
        g(v).map(GreaterThanOrEqual(pAttr, _))
      case GreaterThan(a: AttributeReference, TsLit(v)) if a.name == src =>
        g(v).map(GreaterThanOrEqual(pAttr, _))
      case LessThanOrEqual(a: AttributeReference, TsLit(v)) if a.name == src =>
        g(v).map(LessThanOrEqual(pAttr, _))
      case LessThan(a: AttributeReference, TsLit(v)) if a.name == src =>
        g(v).map(LessThanOrEqual(pAttr, _))
      case EqualTo(a: AttributeReference, TsLit(v)) if a.name == src =>
        g(v).map(EqualTo(pAttr, _))
      case EqualTo(TsLit(v), a: AttributeReference) if a.name == src =>
        g(v).map(EqualTo(pAttr, _))
      // literal-on-left comparisons, mirrored
      case GreaterThanOrEqual(TsLit(v), a: AttributeReference) if a.name == src =>
        g(v).map(LessThanOrEqual(pAttr, _)) // v >= ts  ⇔  ts <= v
      case GreaterThan(TsLit(v), a: AttributeReference) if a.name == src =>
        g(v).map(LessThanOrEqual(pAttr, _))
      case LessThanOrEqual(TsLit(v), a: AttributeReference) if a.name == src =>
        g(v).map(GreaterThanOrEqual(pAttr, _))
      case LessThan(TsLit(v), a: AttributeReference) if a.name == src =>
        g(v).map(GreaterThanOrEqual(pAttr, _))
      case _ => None
    }
  }

  /** Timestamp literal (TZ or NTZ) → internal micros. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case Literal(v: Long, TimestampNTZType) => Some(v)
      case _ => None
    }
  }

  /** date/year of a UTC timestamp as the partition-typed literal —
    * Math.floorDiv keeps pre-epoch days correct. */
  private def genLiteral(kind: String, micros: Long): Option[Literal] = {
    val days = Math.floorDiv(micros, 86400L * 1000 * 1000).toInt
    kind match {
      case "date" => Some(Literal(days, DateType))
      case "year" =>
        Some(Literal(LocalDate.ofEpochDay(days.toLong).getYear, IntegerType))
      case _ => None
    }
  }

  /** Install into a session once (idempotent; see plans.AsOfJoin). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(GeneratedPartitionFilters))
      spark.experimental.extraOptimizations = opts :+ GeneratedPartitionFilters
  }
}
