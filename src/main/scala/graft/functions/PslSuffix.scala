package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix membership as a native predicate (round 13).
  *
  * The first full-PSL form expressed the 3,614-rule test as
  * `isin(<3,614 string literals>)`: Catalyst converts that to an
  * `InSet` (O(1) per row), but the literal children live in the
  * EXPRESSION TREE — and `Curation.registrableDomain`'s derived column
  * is re-inlined at every reference (join key, window key, two group
  * keys, blocked flag), so every query carrying it paid ~5 × 36 KB of
  * tree through analysis, optimization, and plan serialization
  * (measured: `curate_domains` warm median 0.61 → 1.19 s at sf0.1 from
  * plan-time cost alone). This expression is ONE tree node; the rule
  * set is process-local metadata loaded lazily from the classpath
  * resource — executors on a real cluster load it from the same jar,
  * nothing ships in the plan.
  */
object PslSuffixImpl {
  /** The PSL ICANN section's two-label ASCII rules (see the resource
    * header for provenance and the documented out-of-scope classes). */
  lazy val rules: java.util.HashSet[String] = {
    val in = getClass.getResourceAsStream("/graft/psl_two_label_icann.txt")
    require(in != null, "psl_two_label_icann.txt missing from classpath")
    val set = new java.util.HashSet[String](8192)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(l => l.isEmpty || l.startsWith("#")).foreach(set.add)
    finally in.close()
    set
  }

  def isMultiLabelSuffix(s: UTF8String): Boolean = rules.contains(s.toString)
}

/** `true` iff the (already-lowercased) string is a two-label ICANN
  * public suffix — the promotion test of
  * [[graft.etl.Curation.registrableDomain]]. */
case class IsPslSuffix(child: Expression)
    extends UnaryExpression with Predicate {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"is_psl_suffix expects string, got ${other.simpleString}")
  }
  override def prettyName: String = "is_psl_suffix"
  override def nullSafeEval(input: Any): Any =
    PslSuffixImpl.isMultiLabelSuffix(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PslSuffixImpl.isMultiLabelSuffix($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
