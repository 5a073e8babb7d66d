package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, Expression, GenericInternalRow, JoinedRow, PredicateHelper,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — preference tier (c): a whole-operator semantic
  * Spark lacks, expressed as a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan` instead of the tag/union/window composition in
  * [[graft.analytics.Temporal.asofBackward]].
  *
  * Three directions, matching DuckDB's ASOF inequality forms and
  * pandas `merge_asof`:
  *  - `backward` (default): latest right row with `right.ts <= left.ts`
  *    (DuckDB `ON l.key = r.key AND l.ts >= r.ts`)
  *  - `forward`: earliest right row with `right.ts >= left.ts`
  *    (DuckDB `ON l.key = r.key AND l.ts <= r.ts`)
  *  - `nearest`: whichever of the two is closer in time; ties prefer
  *    the backward (earlier) row, like pandas
  * plus an optional `tolerance`: a match farther than the bound in the
  * ts column's native units (µs for timestamps) is null-extended.
  * Every left row appears exactly once, NULL-extended when unmatched.
  *
  * Why a physical operator wins at scale: the composed version unions
  * both sides into ONE shuffle whose per-key sort carries every left
  * AND right row through a window with running-`last` state per carry
  * column. The native operator instead declares
  * `ClusteredDistribution(key)` + per-child `(key, ts)` ordering and
  * streams a per-partition dual-cursor MERGE: each side is shuffled
  * independently (map-side width = its own columns only), no union row
  * widening, no window buffering — O(1) state per key, exactly the
  * sorted-merge shape Catalyst gives SortMergeJoin. EnsureRequirements
  * inserts the exchanges/sorts, so AQE still plans both shuffles.
  *
  * The hot loop compares through type-specialized [[ColCmp]] accessors
  * (primitive `getLong`/`getInt` reads, no boxing) rather than
  * per-row interpreted orderings; the generic interpreted path remains
  * only as the fallback for exotic key types.
  *
  * Registered two ways: per-session via
  * `spark.experimental.extraStrategies` (+ `extraOptimizations` for the
  * pushdown rule — done lazily by [[asofNative]]) and cluster-wide via
  * `graft.GraftExtensions` (injectPlannerStrategy + injectOptimizerRule).
  */
object AsOfJoin {

  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"

  /** Type-specialized column comparator for the merge loop: compares a
    * column across two rows without boxing for the common key/ts types,
    * and produces a RETAINED value that stays valid after the source
    * row's backing buffer is reused (the sort iterators recycle one
    * UnsafeRow — holding a raw `get` result across `next()` silently
    * corrupts buffer-backed values like UTF8String). */
  private[plans] sealed trait ColCmp extends Serializable {
    def cmp(a: InternalRow, ai: Int, b: InternalRow, bi: Int): Int
    /** A value safe to hold across iterator advances. */
    def retain(r: InternalRow, i: Int): AnyRef
    def cmpRetained(v: AnyRef, r: InternalRow, i: Int): Int
    /** Long-backed types support tolerance / nearest distances. */
    def diffCapable: Boolean = false
    def longVal(r: InternalRow, i: Int): Long =
      throw new UnsupportedOperationException("not a long-backed column")
  }

  /** All integral/temporal physical-long types: compare and diff via one
    * primitive read. Subclasses only pick the width accessor. */
  private[plans] sealed abstract class LongBackedCmp extends ColCmp {
    override final def cmp(a: InternalRow, ai: Int, b: InternalRow, bi: Int): Int =
      java.lang.Long.compare(longVal(a, ai), longVal(b, bi))
    override final def retain(r: InternalRow, i: Int): AnyRef =
      java.lang.Long.valueOf(longVal(r, i))
    override final def cmpRetained(v: AnyRef, r: InternalRow, i: Int): Int =
      java.lang.Long.compare(v.asInstanceOf[java.lang.Long].longValue(), longVal(r, i))
    override final def diffCapable: Boolean = true
  }
  private[plans] final class LongCmp extends LongBackedCmp {
    override def longVal(r: InternalRow, i: Int): Long = r.getLong(i)
  }
  private[plans] final class IntCmp extends LongBackedCmp {
    override def longVal(r: InternalRow, i: Int): Long = r.getInt(i).toLong
  }
  private[plans] final class ShortCmp extends LongBackedCmp {
    override def longVal(r: InternalRow, i: Int): Long = r.getShort(i).toLong
  }
  private[plans] final class ByteCmp extends LongBackedCmp {
    override def longVal(r: InternalRow, i: Int): Long = r.getByte(i).toLong
  }
  private[plans] final class StringCmp extends ColCmp {
    override def cmp(a: InternalRow, ai: Int, b: InternalRow, bi: Int): Int =
      a.getUTF8String(ai).compareTo(b.getUTF8String(bi))
    override def retain(r: InternalRow, i: Int): AnyRef =
      r.getUTF8String(i).copy() // detach from the reused row buffer
    override def cmpRetained(v: AnyRef, r: InternalRow, i: Int): Int =
      v.asInstanceOf[UTF8String].compareTo(r.getUTF8String(i))
  }
  private[plans] final class GenericCmp(dt: DataType) extends ColCmp {
    private val ord = TypeUtils.getInterpretedOrdering(dt)
    override def cmp(a: InternalRow, ai: Int, b: InternalRow, bi: Int): Int =
      ord.compare(a.get(ai, dt), b.get(bi, dt))
    override def retain(r: InternalRow, i: Int): AnyRef =
      InternalRow.copyValue(r.get(i, dt)).asInstanceOf[AnyRef]
    override def cmpRetained(v: AnyRef, r: InternalRow, i: Int): Int =
      ord.compare(v, r.get(i, dt))
  }

  private[plans] def colCmp(dt: DataType): ColCmp = dt match {
    case LongType | TimestampType | TimestampNTZType => new LongCmp
    case IntegerType | DateType => new IntCmp
    case ShortType => new ShortCmp
    case ByteType => new ByteCmp
    case StringType => new StringCmp
    case other => new GenericCmp(other)
  }

  /** Logical node. Constructed RESOLVED: children are analyzed plans and
    * every attribute is bound to a child output (the builder below
    * guarantees fresh exprIds on the right side, so a self-join of one
    * table never aliases attributes across sides). Opaque to the
    * built-in pushdown rules; [[PushLeftFiltersThroughAsOf]] restores
    * the one pushdown that commutes (left-side predicates — the join
    * only appends carry columns and never drops or duplicates left
    * rows), so filters composed on top reach the left scan. */
  case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Attribute, leftTs: Attribute,
                          rightKey: Attribute, rightTs: Attribute,
                          carry: Seq[Attribute],
                          direction: String = Backward,
                          tolerance: Option[Long] = None) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ carry.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, lt, rk, rt, carry, dir, tol) =>
        AsOfJoinExec(lk, lt, rk, rt, carry, dir, tol,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Optimizer rule: push deterministic left-only predicates below the
    * as-of join. Safe because the operator is left-preserving (each left
    * row maps to exactly one output row) and the pushed predicate
    * references no carry column — filtering left rows before the join
    * commutes with attaching carries. Injected into the operator-
    * optimization batch via GraftExtensions, the pushed Filter then
    * rides the built-in PushDownPredicates the rest of the way into the
    * scan's PushedFilters. */
  object PushLeftFiltersThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, a: AsOfJoinPlan) =>
        val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
          p.deterministic && p.references.subsetOf(a.left.outputSet))
        if (push.isEmpty) f
        else {
          val pushed = a.copy(left = Filter(push.reduce(And), a.left))
          keep.reduceOption[Expression](And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Physical merge as-of join. Children arrive co-partitioned on the
    * key and sorted by (key, ts) — declared, not assumed; Catalyst's
    * EnsureRequirements materializes whatever exchange/sort is missing. */
  case class AsOfJoinExec(leftKey: Attribute, leftTs: Attribute,
                          rightKey: Attribute, rightTs: Attribute,
                          carry: Seq[Attribute],
                          direction: String, tolerance: Option[Long],
                          left: SparkPlan, right: SparkPlan)
      extends BinaryExecNode {

    require(Set(Backward, Forward, Nearest).contains(direction),
      s"as-of direction must be backward|forward|nearest, got $direction")
    require(leftKey.dataType == rightKey.dataType,
      s"as-of key types must match: left ${leftKey.dataType} vs right ${rightKey.dataType}")
    require(leftTs.dataType == rightTs.dataType,
      s"as-of ts types must match: left ${leftTs.dataType} vs right ${rightTs.dataType}")
    require(tolerance.forall(_ >= 0), "as-of tolerance must be non-negative")

    override def output: Seq[Attribute] =
      left.output ++ carry.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
          SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)) ::
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
          SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)) :: Nil

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output; val rOut = right.output
      val lkOrd = lOut.indexWhere(_.exprId == leftKey.exprId)
      val ltOrd = lOut.indexWhere(_.exprId == leftTs.exprId)
      val rkOrd = rOut.indexWhere(_.exprId == rightKey.exprId)
      val rtOrd = rOut.indexWhere(_.exprId == rightTs.exprId)
      require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
        "as-of attributes must resolve against child outputs")
      val keyType = leftKey.dataType; val tsType = leftTs.dataType
      val carryAttrs = carry
      val outAttrs = output
      val dir = direction
      val needDiff = dir == Nearest || tolerance.isDefined
      val tolLong = tolerance.getOrElse(Long.MaxValue)
      if (needDiff) require(colCmp(tsType).diffCapable,
        s"as-of $dir/tolerance needs an integral or timestamp ts column, got $tsType")
      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val keyCmp = colCmp(keyType)
        val tsCmp = colCmp(tsType)
        val carryProj = UnsafeProjection.create(carryAttrs, rOut)
        // carry inputs bound NULLABLE: the null-extension row feeds this
        // projection, and a non-nullable BoundReference would skip the
        // null check and NPE on primitive reads
        val resultProj = UnsafeProjection.create(
          outAttrs, lOut ++ carryAttrs.map(_.withNullability(true)))
        val nullCarry = new GenericInternalRow(carryAttrs.length)
        val joined = new JoinedRow
        // one-row lookahead on the right + the latest backward match per
        // key: O(1) state, single forward pass over each side. Retained
        // values (lastKey/lastTs) go through ColCmp.retain — the raw
        // `get` of a buffer-backed type would alias the sort iterator's
        // reused row and rot once the cursor advances.
        var rHead: InternalRow = null
        var lastKey: AnyRef = null
        var lastTsLong: Long = 0L
        var lastCarry: InternalRow = null
        val consumeBackward = dir != Forward
        lIt.map { lrow =>
          val lkNull = lrow.isNullAt(lkOrd); val ltNull = lrow.isNullAt(ltOrd)
          if (!lkNull && !ltNull) {
            var continue = true
            while (continue && (rHead != null || rIt.hasNext)) {
              if (rHead == null) rHead = rIt.next()
              if (rHead.isNullAt(rkOrd) || rHead.isNullAt(rtOrd)) rHead = null
              else {
                val c = keyCmp.cmp(rHead, rkOrd, lrow, lkOrd)
                if (c < 0) rHead = null // bypassed key; drop
                else if (c == 0 && tsCmp.cmp(rHead, rtOrd, lrow, ltOrd) <= 0) {
                  if (consumeBackward) {
                    lastKey = keyCmp.retain(rHead, rkOrd)
                    if (needDiff) lastTsLong = tsCmp.longVal(rHead, rtOrd)
                    lastCarry = carryProj(rHead).copy() // proj row is reused
                    rHead = null
                  } else if (tsCmp.cmp(rHead, rtOrd, lrow, ltOrd) < 0) {
                    rHead = null // forward: strictly-prior right is dead
                  } else continue = false // equal ts IS the forward match
                } else continue = false // right is ahead; keep for later
              }
            }
          }
          // a null-key or null-ts left row never matches, regardless of
          // retained state or child-sort null placement
          val usable = !lkNull && !ltNull
          val backOk = usable && consumeBackward && lastCarry != null &&
            keyCmp.cmpRetained(lastKey, lrow, lkOrd) == 0 &&
            (!needDiff || tsCmp.longVal(lrow, ltOrd) - lastTsLong <= tolLong)
          val fwdOk = usable && dir != Backward && rHead != null &&
            keyCmp.cmp(rHead, rkOrd, lrow, lkOrd) == 0 &&
            (!needDiff || tsCmp.longVal(rHead, rtOrd) - tsCmp.longVal(lrow, ltOrd) <= tolLong)
          val useBack =
            if (backOk && fwdOk) // nearest: ties prefer the earlier row
              tsCmp.longVal(lrow, ltOrd) - lastTsLong <=
                tsCmp.longVal(rHead, rtOrd) - tsCmp.longVal(lrow, ltOrd)
            else backOk
          val carryRow =
            if (useBack) lastCarry
            else if (fwdOk) carryProj(rHead)
            else nullCarry
          resultProj(joined(lrow, carryRow))
        }
      }
    }
  }

  /** Install the strategy + pushdown rule into a session once (idempotent). */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushLeftFiltersThroughAsOf))
      spark.experimental.extraOptimizations = opts :+ PushLeftFiltersThroughAsOf
  }

  /** As-of join via the native operator — same contract as
    * [[graft.analytics.Temporal.asofBackward]] when `direction` is
    * `backward`: attach `carry` columns of the matching right row per
    * `key`, NULLs when none (or when the match exceeds `tolerance`, in
    * the ts column's native units — µs for timestamps). The right side
    * is re-aliased (fresh exprIds) so a self-join of one table is safe,
    * and both sides are projected to exactly the columns the operator
    * consumes before planning. */
  def asofNative(left: DataFrame, right: DataFrame, key: String,
                 ts: String, carry: Seq[String],
                 direction: String = Backward,
                 tolerance: Option[Long] = None): DataFrame = {
    require(carry.nonEmpty, "asofNative needs at least one carried column")
    require(carry.forall(right.columns.contains), s"right side must contain $carry")
    require(carry.forall(!left.columns.contains(_)), s"carry $carry collide with left")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val r = right.select(
      col(key).as("__asof_key") +: col(ts).as("__asof_ts") +:
        carry.map(c => col(c).as(c)): _*)
    val lplan = left.queryExecution.analyzed
    val rplan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${p.output.map(_.name)}"))
    def dt(p: LogicalPlan, name: String) = attr(p, name).dataType
    require(dt(lplan, key) == dt(rplan, "__asof_key"),
      s"as-of key types must match: left ${dt(lplan, key)} vs right ${dt(rplan, "__asof_key")}")
    require(dt(lplan, ts) == dt(rplan, "__asof_ts"),
      s"as-of ts types must match: left ${dt(lplan, ts)} vs right ${dt(rplan, "__asof_ts")}")
    val node = AsOfJoinPlan(lplan, rplan,
      attr(lplan, key), attr(lplan, ts),
      attr(rplan, "__asof_key"), attr(rplan, "__asof_ts"),
      carry.map(attr(rplan, _)), direction, tolerance)
    GraftPlanBridge.ofRows(spark, node)
  }
}
