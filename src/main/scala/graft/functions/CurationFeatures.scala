package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The curation funnel's WHOLE per-row feature set in one JVM loop
  * (round 13, VERDICT stretch #9): the round-12 funnel's flags
  * projection evaluated `paragraph_window_stats` (1 tokenize), five
  * langid `scoreCol`s (5 tokenizes — one `filter(tokens(...))` per
  * language), and the quality features (2 more tokenizes + 1 full-text
  * regexp_replace) — up to EIGHT tokenize passes and a regex scan over
  * every document, because each declarative reference re-inlines the
  * whole `split`/`filter` tree and codegen subexpression elimination
  * does not reliably fold them (the round-12 struct-CSE miss). This
  * expression tokenizes ONCE and emits everything the funnel needs:
  *
  *   - `nt`: total token count of the LOWERED text (the shared
  *     tokenizer's count — windows partition the token stream);
  *   - `chars`/`punct`: code-point count and non-[\p{L}\p{N}\s] count
  *     of the RAW text (exactly `length(text)` and
  *     `length(regexp_replace(text, "[\p{L}\p{N}\s]", ""))` — Java
  *     regex semantics replicated per code point: letters = the five L
  *     categories, numbers = Nd/Nl/No, whitespace = Java's ASCII `\s`);
  *   - `stop`: per-language stopword hit counts over the lowered
  *     tokens, one per inventory in declaration order — bit-identical
  *     to `size(filter(tokens(text), t -> array_contains(inv, t)))`;
  *   - `paras`: the segment-aware `(md5, n_tokens)` window pairs of
  *     [[ParagraphWindowStatsImpl]] (same boundary rule, same hash).
  *
  * Lowering happens IN the loop via `UTF8String.toLowerCase` — the
  * same kernel `lower()` uses, so parity with the declarative chain
  * (and the DuckDB oracle's `lower(text)` CTEs) is exact, including
  * the Unicode edge cases. Spec-pinned equal to the declarative
  * langid/quality/windowStats outputs over fixtures with accents, CJK,
  * mixed scripts, and exotic punctuation. */
object CurationFeaturesImpl {
  private val Hex = "0123456789abcdef".toCharArray

  /** Java-regex `[\p{L}\p{N}\s]` per code point: the five letter
    * categories, the three number categories, and ASCII `\s`
    * (space, \t, \n, \x0B, \f, \r — Java's default \s is NOT
    * Unicode-aware). */
  private def isTokenOrSpace(cp: Int): Boolean = {
    if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r') return true
    val t = Character.getType(cp)
    t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
    t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
    t == Character.OTHER_LETTER ||
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
    t == Character.OTHER_NUMBER
  }

  def compute(raw: UTF8String, w: Int,
              stopSets: Array[java.util.HashSet[String]],
              benchGrams: java.util.HashSet[String],
              gramN: Int): InternalRow = {
    // RAW-text census: code points + punctuation, Java-regex semantics
    val s = raw.toString
    var chars = 0L
    var punct = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      chars += 1
      if (!isTokenOrSpace(cp)) punct += 1
      i += Character.charCount(cp)
    }
    // LOWERED-text tokens: the same kernel lower() applies
    val lowered = raw.toLowerCase.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val paras = scala.collection.mutable.ArrayBuffer.empty[Any]
    val stops = new Array[Long](stopSets.length)
    val allToks = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0
    ParagraphWindowsImpl.segments(lowered).foreach { seg =>
      val toks = TextShingles.tokenize(seg)
      total += toks.length
      var t = 0
      while (t < toks.length) {
        var l = 0
        while (l < stopSets.length) {
          if (stopSets(l).contains(toks(t))) stops(l) += 1
          l += 1
        }
        allToks += toks(t)
        t += 1
      }
      val n = if (toks.isEmpty) 0 else (toks.length + w - 1) / w
      var k = 0
      while (k < n) {
        val start = k * w
        val end = math.min(start + w, toks.length)
        val sb = new java.lang.StringBuilder()
        var j = start
        while (j < end) {
          if (j > start) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        md.reset()
        val dg = md.digest(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = Hex((dg(b) >> 4) & 0xf)
          hex(2 * b + 1) = Hex(dg(b) & 0xf)
          b += 1
        }
        paras += new GenericInternalRow(
          Array[Any](UTF8String.fromString(new String(hex)), end - start))
        k += 1
      }
    }
    // contamination over the CONCATENATED token stream (word_ngrams
    // ignores segment boundaries — per-segment token lists concatenate
    // to exactly the whole-text tokenizer output because boundaries are
    // whitespace runs the tokenizer drops anyway): n-gram windows with
    // word_ngrams' exact iteration (short docs contribute their full
    // span as one gram, empty docs the "" gram), early-exit on the
    // first hit — the flag is `n_hits > 0`, never the count
    var contaminated = false
    if (!benchGrams.isEmpty) {
      val len = allToks.length
      val last = math.max(len - gramN, 0)
      var g = 0
      while (g <= last && !contaminated) {
        val end = math.min(g + gramN, len)
        val sb = new java.lang.StringBuilder()
        var j = g
        while (j < end) {
          if (j > g) sb.append(' ')
          sb.append(allToks(j))
          j += 1
        }
        if (benchGrams.contains(sb.toString)) contaminated = true
        g += 1
      }
    }
    new GenericInternalRow(Array[Any](total, chars, punct,
      new GenericArrayData(stops.map(x => x: Any)),
      new GenericArrayData(paras.toArray), contaminated))
  }
}

case class CurationFeatures(child: Expression, w: Int,
                            stopwords: Seq[Seq[String]],
                            benchGrams: Seq[String] = Seq.empty,
                            gramN: Int = 8)
    extends UnaryExpression {
  require(w >= 1, "window size must be >= 1")
  require(gramN >= 1, "contamination gram size must be >= 1")

  @transient private lazy val stopSets: Array[java.util.HashSet[String]] =
    stopwords.map { ws =>
      val set = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(set.add)
      set
    }.toArray

  @transient private lazy val benchSet: java.util.HashSet[String] = {
    val set = new java.util.HashSet[String](benchGrams.size * 2)
    benchGrams.foreach(set.add)
    set
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"curation_features expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("nt", IntegerType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("punct", LongType, nullable = false),
    StructField("stop", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("paras", ArrayType(StructType(Seq(
      StructField("h", StringType, nullable = false),
      StructField("nt", IntegerType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("contaminated", BooleanType, nullable = false)))
  override def prettyName: String = "curation_features"
  override def nullSafeEval(input: Any): Any =
    CurationFeaturesImpl.compute(input.asInstanceOf[UTF8String], w, stopSets,
      benchSet, gramN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the stopword/bench-gram sets are expression metadata riding as
    // codegen reference objects — nothing re-parses per row
    val setsRef = ctx.addReferenceObj("stopSets", stopSets,
      "java.util.HashSet[]")
    val benchRef = ctx.addReferenceObj("benchGrams", benchSet,
      "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CurationFeaturesImpl.compute($c, $w, $setsRef, " +
        s"$benchRef, $gramN)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CurationFeaturesFunctions {
  /** The funnel's feature column over RAW `text` — built directly (the
    * GraftPlanBridge.column discipline: per-call metadata must not ride
    * a session-global registry name). `benchGrams` is the benchmark
    * n-gram set for the fused contamination flag (eval-suite-sized by
    * contract — it is BROADCAST-CLASS metadata exactly like the
    * declarative path's broadcast side; empty = flag always false). */
  def curation_features(spark: SparkSession, text: Column, w: Int,
                        stopwords: Seq[Seq[String]],
                        benchGrams: Seq[String] = Seq.empty,
                        gramN: Int = 8): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      CurationFeatures(
        org.apache.spark.sql.GraftPlanBridge.expression(text), w, stopwords,
        benchGrams, gramN))
}
