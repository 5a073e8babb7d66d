package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ encoder: for an `array<double>` vector, the argmin codebook
  * index per subspace — `codes[j] = argmin_c Σ_i (v[j·subd+i] − cb[j][c][i])²`
  * with ties to the LOWER code, matching the SQL
  * `array_min(transform(...))` formulation bit-for-bit (identical
  * ascending-index accumulation order).
  *
  * Why a native Expression: the SQL encode is a `transform` HOF over the
  * codebook — Spark evaluates HOF lambdas INTERPRETED, one dispatch plus
  * a struct allocation per (row, subspace, code). At k=16 that was
  * tolerable; at byte codes (k=256, round 11) encoding the sf10 corpus
  * became 819M lambda dispatches and the one-time index build measured
  * ~24 minutes. This expression runs the same arithmetic as three
  * primitive loops inside whole-stage codegen (the codebook rides the
  * generated class's `references` array) — the identical-output,
  * minutes→seconds replacement, the [[CosineSim]] discipline applied to
  * encoding.
  *
  * The codebook is embedded as expression METADATA (not a per-row
  * column): m·k·(d/m) doubles ≤ a few hundred KB at any corpus size —
  * it serializes once per stage, never per row. */
case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = cb.length
  private val k = cb(0).length
  private val subd = cb(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == m * subd,
      s"pq_encode: dim ${v.numElements()} != m*subd (${m * subd})")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cc = cbj(c)
        var d = 0.0
        var i = 0
        while (i < subd) {
          val diff = v.getDouble(j * subd + i) - cc(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict <: ties stay low
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cbj = ctx.freshName("cbj")
      val cc = ctx.freshName("cc")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      s"""
         |if ($v.numElements() != ${m * subd}) throw new IllegalArgumentException(
         |  "pq_encode: dim " + $v.numElements() + " != ${m * subd}");
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double[][] $cbj = $cbRef[$j];
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double[] $cc = $cbj[$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $subd; $i++) {
         |      double $diff = $v.getDouble($j * $subd + $i) - $cc[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeFunction {

  /** Codebooks as primitive arrays for the expression. */
  def toArrays(cb: Seq[Seq[Seq[Double]]]): Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  /** Column front door — the codebook binds directly into the
    * expression (driver metadata), only the vector is a column. The
    * expression is constructed straight into the Column (no
    * registry round-trip): unlike `word_ngrams`, whose arguments are
    * all literals, the codebook rides in the BUILDER's closure, so a
    * session-global registered name would let two concurrent
    * encode/train calls interleave register/resolve and silently bind
    * each other's codebooks. */
  def pq_encode(spark: SparkSession, v: Column,
                cb: Seq[Seq[Seq[Double]]]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      PqEncode(org.apache.spark.sql.GraftPlanBridge.expression(v), toArrays(cb)))
}
