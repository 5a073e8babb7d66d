package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling. Semantics identical to the declarative
  * `array_distinct(transform(sequence(0, greatest(size(toks)-n, 0)),
  * i -> concat_ws(' ', slice(toks, i+1, n))))` over the SHARED tokenizer
  * ([[graft.text.TextOps.TokenizePattern]]: split on non-letter/digit
  * runs, empties dropped — round 9; short docs contribute their full
  * token span as one shingle, first-occurrence distinct order) — but as
  * one JVM loop per row instead of interpreted lambdas per shingle.
  * Shingling feeds minhash, n-gram Jaccard, and contamination scans,
  * where the lambda interpreter dominated at sf1 (26 s of the
  * contamination query).
  */
object TextShingles {
  // compiled once; identical pattern to TextOps.TokenizePattern (kept
  // literal here to avoid a class-init cycle with the text package)
  private val TokenRe = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  def tokenize(s: String): Array[String] =
    TokenRe.split(s, -1).filter(_.nonEmpty)

  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(s.toString)
    val last = math.max(toks.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullSafeEval(input: Any): Any =
    TextShingles.wordNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.wordNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextShingleFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams",
      exprs => WordNgrams(exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
  def word_ngrams(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    call_function("word_ngrams", text, lit(n))
  }
}
