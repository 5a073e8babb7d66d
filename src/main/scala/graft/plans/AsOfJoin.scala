package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native backward as-of join — preference tier (c): a whole-operator
  * semantic Spark lacks, expressed as a custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` instead of the tag/union/window
  * composition in [[graft.analytics.Temporal.asofBackward]].
  *
  * Semantics (identical to the composed operator and DuckDB's
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`): every left
  * row is joined to the LATEST right row of the same key with
  * `right.ts <= left.ts` (inclusive), NULL-extended when none exists.
  *
  * Why a physical operator wins at scale: the composed version unions
  * both sides into ONE shuffle whose per-key sort carries every left
  * AND right row through a window with running-`last` state per carry
  * column. The native operator instead declares
  * `ClusteredDistribution(key)` + per-child `(key, ts)` ordering and
  * streams a per-partition dual-cursor MERGE: each side is shuffled
  * independently (map-side width = its own columns only), no union row
  * widening, no window buffering — O(1) state per key (the last
  * matching right row), exactly the sorted-merge shape Catalyst gives
  * SortMergeJoin. EnsureRequirements inserts the exchanges/sorts, so
  * AQE still plans both shuffles.
  *
  * Registered two ways: per-session via
  * `spark.experimental.extraStrategies` (done lazily by [[asofNative]])
  * and cluster-wide via `graft.GraftExtensions` (injectPlannerStrategy).
  */
object AsOfJoin {

  /** Logical node. Constructed RESOLVED: children are analyzed plans and
    * every attribute is bound to a child output (the builder below
    * guarantees fresh exprIds on the right side, so a self-join of one
    * table never aliases attributes across sides). Unknown to the
    * optimizer's pushdown rules, it acts as a barrier — correct, if
    * conservative; the builder projects both sides down to what the
    * operator needs first, so there is nothing left to prune. */
  case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Attribute, leftTs: Attribute,
                          rightKey: Attribute, rightTs: Attribute,
                          carry: Seq[Attribute]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ carry.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, lt, rk, rt, carry) =>
        AsOfJoinExec(lk, lt, rk, rt, carry, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Physical merge as-of join. Children arrive co-partitioned on the
    * key and sorted by (key, ts) — declared, not assumed; Catalyst's
    * EnsureRequirements materializes whatever exchange/sort is missing. */
  case class AsOfJoinExec(leftKey: Attribute, leftTs: Attribute,
                          rightKey: Attribute, rightTs: Attribute,
                          carry: Seq[Attribute],
                          left: SparkPlan, right: SparkPlan)
      extends BinaryExecNode {

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
      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
        val tsOrdering = TypeUtils.getInterpretedOrdering(tsType)
        val carryProj = UnsafeProjection.create(carryAttrs, rOut)
        // carry inputs bound NULLABLE: the null-extension row feeds this
        // projection, and a non-nullable BoundReference would skip the
        // null check and NPE on primitive reads
        val resultProj = UnsafeProjection.create(
          outAttrs, lOut ++ carryAttrs.map(_.withNullability(true)))
        val nullCarry = new GenericInternalRow(carryAttrs.length)
        val joined = new JoinedRow
        // one-row lookahead on the right + the latest match per key:
        // O(1) state, single forward pass over each side
        var rHead: InternalRow = null
        var lastKey: Any = null
        var lastCarry: InternalRow = null
        lIt.map { lrow =>
          val lk = lrow.get(lkOrd, keyType)
          val lt = lrow.get(ltOrd, tsType)
          if (lk != null && lt != null) {
            var continue = true
            while (continue && (rHead != null || rIt.hasNext)) {
              if (rHead == null) rHead = rIt.next()
              val rk = rHead.get(rkOrd, keyType)
              val rt = rHead.get(rtOrd, tsType)
              if (rk == null || rt == null) rHead = null // can never match
              else {
                val c = keyOrdering.compare(rk, lk)
                if (c < 0) rHead = null // bypassed key; drop
                else if (c == 0 && tsOrdering.compare(rt, lt) <= 0) {
                  lastKey = rk
                  lastCarry = carryProj(rHead).copy() // proj row is reused
                  rHead = null
                } else continue = false // right is ahead; keep for later
              }
            }
          }
          val matched = lk != null && lastCarry != null &&
            keyOrdering.compare(lastKey, lk) == 0
          resultProj(joined(lrow, if (matched) lastCarry else nullCarry))
        }
      }
    }
  }

  /** Install the strategy into a session once (idempotent). */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Backward as-of join via the native operator — same contract as
    * [[graft.analytics.Temporal.asofBackward]]: attach `carry` columns
    * of the latest right row with `right.ts <= left.ts` per `key`,
    * NULLs when none. The right side is re-aliased (fresh exprIds) so a
    * self-join of one table is safe, and both sides are projected to
    * exactly the columns the operator consumes before planning. */
  def asofNative(left: DataFrame, right: DataFrame, key: String,
                 ts: String, carry: Seq[String]): DataFrame = {
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
    val node = AsOfJoinPlan(lplan, rplan,
      attr(lplan, key), attr(lplan, ts),
      attr(rplan, "__asof_key"), attr(rplan, "__asof_ts"),
      carry.map(attr(rplan, _)))
    GraftPlanBridge.ofRows(spark, node)
  }
}
