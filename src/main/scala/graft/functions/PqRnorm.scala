package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native reconstruction-norm lookups for the PQ/IVF×PQ encode paths
  * (optimization r17). The SQL formulation spelled each norm as a chain
  * of `__tbl[cell][j][codes[j]]` array-literal lookups; CollapseProject
  * inlines literal-aliased columns into EVERY reference, so the encode
  * plan carried ~32 copies of an nCells·m·k-double nested literal
  * (16,384 doubles at the ann shape, 262,144 at the k=256 default) and
  * every analysis / AQE re-optimization / cache-comparison pass walked
  * them — measured: a rebalance-staged code-table write spent ~1.7 s of
  * pure driver plan time over a 400-row corpus, and the same plan shape
  * rode every retrain, extension, and rebalance encode. These
  * expressions hold the tables as expression METADATA (one reference in
  * the generated class, like [[PqEncode]]'s codebook) — the plan is one
  * node, the per-row arithmetic is IDENTICAL, term order and all, so
  * outputs are bit-for-bit unchanged.
  */

/** `rnorm = sqrt(Σ_j n2[j][codes[j]])` — the plain-PQ reconstruction
  * norm ([[graft.similarity.Pq.encodeWithNorm]]); strict ascending-j
  * accumulation matches the SQL `__n2[0][codes[0]] + … + __n2[m-1][…]`
  * left-to-right chain bit-for-bit. */
case class PqNorm(child: Expression, n2: Array[Array[Double]])
    extends UnaryExpression {
  private val m = n2.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_norm expects array<int> codes, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_norm"

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    while (j < m) { s += n2(j)(codes.getInt(j)); j += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val n2Ref = ctx.addReferenceObj("pqn2", n2, "double[][]")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $s += $n2Ref[$j][$codes.getInt($j)];
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `rnorm = sqrt(cn2[cell] + 2·Σ_j d2[cell][j][codes[j]] +
  * Σ_j rn2[j][codes[j]])` — the residual-encoded IVF×PQ reconstruction
  * norm ([[graft.similarity.IvfPq.codeRows]]). Accumulation order
  * matches the SQL chain exactly: both sums fold ascending-j
  * left-to-right, and the outer expression associates as
  * `(cn2[cell] + 2·cross) + resid`. */
case class PqRnorm(left: Expression, right: Expression,
                   cn2: Array[Double], d2: Array[Array[Array[Double]]],
                   rn2: Array[Array[Double]])
    extends BinaryExpression {
  private val m = rn2.length

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_rnorm expects (array<int> codes, int cell), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_rnorm"

  override def nullSafeEval(codesAny: Any, cellAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val cell = cellAny.asInstanceOf[Int]
    val d2c = d2(cell)
    var cross = 0.0
    var j = 0
    while (j < m) { cross += d2c(j)(codes.getInt(j)); j += 1 }
    var resid = 0.0
    j = 0
    while (j < m) { resid += rn2(j)(codes.getInt(j)); j += 1 }
    math.sqrt((cn2(cell) + 2 * cross) + resid)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, cell) => {
      val cn2Ref = ctx.addReferenceObj("pqcn2", cn2, "double[]")
      val d2Ref = ctx.addReferenceObj("pqd2", d2, "double[][][]")
      val rn2Ref = ctx.addReferenceObj("pqrn2", rn2, "double[][]")
      val d2c = ctx.freshName("d2c")
      val cross = ctx.freshName("cross")
      val resid = ctx.freshName("resid")
      val j = ctx.freshName("j")
      s"""
         |double[][] $d2c = $d2Ref[$cell];
         |double $cross = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $cross += $d2c[$j][$codes.getInt($j)];
         |}
         |double $resid = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $resid += $rn2Ref[$j][$codes.getInt($j)];
         |}
         |${ev.value} = java.lang.Math.sqrt(($cn2Ref[$cell] + 2 * $cross) + $resid);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqRnormFunction {

  /** Plain-PQ norm column: `sqrt(Σ_j n2[j][codes[j]])`. */
  def pq_norm(spark: SparkSession, codes: Column,
              n2: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      PqNorm(org.apache.spark.sql.GraftPlanBridge.expression(codes),
        n2.map(_.toArray).toArray))

  /** Residual IVF×PQ norm column:
    * `sqrt(cn2[cell] + 2·Σ d2[cell][j][codes[j]] + Σ rn2[j][codes[j]])`. */
  def pq_rnorm(spark: SparkSession, codes: Column, cell: Column,
               cn2: Seq[Double], d2: Seq[Seq[Seq[Double]]],
               rn2: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      PqRnorm(org.apache.spark.sql.GraftPlanBridge.expression(codes),
        org.apache.spark.sql.GraftPlanBridge.expression(cell),
        cn2.toArray, d2.map(_.map(_.toArray).toArray).toArray,
        rn2.map(_.toArray).toArray))
}
