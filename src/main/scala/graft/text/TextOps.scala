package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * shingling, language-ID, quality scoring, token counting, document
  * fingerprinting.
  *
  * All pure per-row projections (no shuffle): built from codegen'd
  * functions plus higher-order array functions. Deterministic — every
  * hash is xxhash64/md5, no RNG — so outputs are stable across runs and
  * engines.
  */
object TextOps {

  /** THE tokenizer (round 9): split on any run of non-letter/non-digit
    * characters (Unicode classes, so accents/Cyrillic/CJK codepoints are
    * token chars and punctuation of any script is a separator), drop
    * empty tokens. One pattern shared by every text operator AND every
    * DuckDB oracle ([[tokenizePatternSql]]): Java regex and RE2 agree on
    * `\p{L}`/`\p{N}`, which a spec corpus of punctuated/multi-script/
    * extra-whitespace rows pins. Replaces the round-1..8 single-space
    * split, whose contract was the synthetic corpus's, not a text
    * engine's. */
  val TokenizePattern = "[^\\p{L}\\p{N}]+"

  /** The same pattern as a DuckDB SQL snippet fragment — single source
    * of truth for oracle construction. Standard (non-E) SQL string
    * literals keep backslashes literal on the DuckDB side. */
  def tokenizeSql(expr: String): String =
    s"list_filter(regexp_split_to_array($expr, '[^\\p{L}\\p{N}]+'), t -> t <> '')"

  /** Token array of `c` (no case folding — callers pass `lower(...)`
    * when the operator is case-insensitive). */
  def tokenize(c: Column): Column =
    filter(split(c, TokenizePattern), t => t =!= lit(""))

  /** Tokens of the lowercased text — the case-folded default. */
  def tokens(text: Column): Column = tokenize(lower(text))

  /** Distinct word n-gram shingles, the MinHash input unit. Short docs
    * (< n tokens) contribute their full token span as one shingle.
    *
    * NOTE: every reference to `$textCol` here is re-evaluated per shingle
    * when the argument is an expression like `split(...)` — bind a token
    * ARRAY COLUMN first (see [[withShingles]]) so tokenization runs once
    * per row, not once per shingle. */
  def shingleExpr(textCol: String, n: Int): Column = expr(
    s"""array_distinct(transform(
       |  sequence(0, greatest(size($textCol) - $n, 0)),
       |  i -> concat_ws(' ', slice($textCol, i + 1, $n))))""".stripMargin)

  /** Adds `shingles` via the native [[graft.functions.WordNgrams]]
    * expression — one JVM loop per row; the declarative [[shingleExpr]]
    * form runs its lambdas interpreted per shingle and dominated the
    * sf1 contamination/minhash profiles. Value-identical (spec-proven). */
  def withShingles(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.withColumn("shingles", graft.functions.TextShingleFunctions
      .word_ngrams(df.sparkSession, lower(col(textCol)), n))

  // ------------------------------------------------------------- lang id

  /** Tiny per-language stopword inventories for the n-gram-free heuristic:
    * score = |tokens ∩ stopwords(lang)|, predict argmax with a fixed
    * tie-break order. Compact by design — language ID at corpus scale is
    * a pruning heuristic, not a classifier. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "se", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de" -> Seq("der", "die", "das", "und", "den", "von", "zu", "mit", "des", "ist"),
    "zh" -> Seq("de", "shi", "zai", "le", "he", "you", "wo", "ta", "men", "zhe"))

  private def scoreCol(textCol: String, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(col(textCol)), t => array_contains(arr, t))).cast("bigint")
  }

  /** doc frame → (doc_id, score_<lang>..., lang_pred). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = stopwords.foldLeft(docs) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang", scoreCol(textCol, words))
    }
    // argmax with declaration-order tie-break (en first)
    val pred = stopwords.map(_._1).foldRight(lit("und")) { case (lang, els) =>
      val isMax = stopwords.map(_._1).filter(_ != lang)
        .map(o => col(s"score_$lang") >= col(s"score_$o"))
        .reduce(_ && _)
      when(isMax && col(s"score_$lang") > 0, lit(lang)).otherwise(els)
    }
    scored.withColumn("lang_pred", pred)
  }

  // ------------------------------------------------------------- quality

  /** Length/punctuation/stopword quality features + a composite score in
    * [0,1]. Ratios are computed on raw values and rounded only at the
    * output edge. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val nChars = length(col(textCol)).cast("long")
    val nTokens = size(tokens(col(textCol))).cast("long")
    // unicode-aware "punctuation": anything outside letters/digits/
    // whitespace, the complement of the tokenizer's token alphabet
    val punct = length(regexp_replace(col(textCol),
      "[\\p{L}\\p{N}\\s]", "")).cast("double")
    // empty docs: 0 chars of 0 are punctuation (ANSI mode: /0 throws)
    val punctRatio = when(nChars > 0, punct / nChars.cast("double"))
      .otherwise(lit(0.0))
    val stopHits = scoreCol(textCol, stopwords.head._2).cast("double")
    // 0-token docs (all-punctuation) score 0, never divide by zero
    val stopRatio = when(nTokens > 0, stopHits / nTokens.cast("double"))
      .otherwise(lit(0.0))
    docs
      .withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("punct_ratio", round(punctRatio, 4))
      .withColumn("stopword_ratio", round(stopRatio, 4))
      .withColumn("quality_score",
        round(least(nTokens.cast("double") / lit(50.0), lit(1.0)) *
          (lit(1.0) - punctRatio), 4))
  }

  // ------------------------------------------------------- token counting

  /** Tokenizer token count + BPE-ish regex token count (letter runs,
    * digit runs, single punctuation marks — the pre-tokenization split
    * most BPE vocabularies assume; unicode classes, so accented and
    * non-Latin text counts its letters as letters). */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("n_re_tokens",
        size(regexp_extract_all(lower(col(textCol)),
          lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0))).cast("long"))

  // -------------------------------------------------------- fingerprints

  /** Content fingerprints: md5 (engine-portable exact hash) + byte length. */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("n_bytes", octet_length(col(textCol)).cast("long"))

  // ----------------------------------------------------------- redaction

  val EmailPattern = "[a-z0-9.]+@[a-z0-9.]+"
  val PhonePattern = "[0-9]{3}-[0-9]{4,}"

  /** PII redaction: replace email/phone shapes with typed placeholder
    * tokens and count the redactions. Pure projection (codegen'd regex),
    * the standard pre-training scrub pass. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_redactions",
        (size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))) +
         size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0)))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"))

  // ----------------------------------------------- repetition / overlap

  /** Gopher-style within-document repetition features: how much of the
    * doc is the same few n-grams repeated. High top-2-gram share or
    * duplicate-3-gram fraction marks boilerplate/spam for filtering.
    * One explode + per-doc aggregation — shuffle keyed by doc_id only. */
  def repetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val withToks = docs.withColumn("_toks", tokens(col(textCol)))
    val g2 = withToks
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, greatest(size(_toks) - 2, 0)), " +
        "i -> concat_ws(' ', _toks[i], _toks[i+1]))"))
        .as("g"))
    val top2 = g2.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top_2gram_n"), sum(col("c")).as("n_2grams"))
    val g3 = withToks.select(col("doc_id"),
      (size(col("_toks")) - 2).cast("long").as("n3"),
      size(expr(
        "array_distinct(transform(sequence(0, greatest(size(_toks) - 3, 0)), " +
        "i -> concat_ws(' ', _toks[i], _toks[i+1], _toks[i+2])))")).cast("long").as("d3"))
    top2.join(g3, Seq("doc_id"))
      .select(col("doc_id"), col("n_2grams"), col("top_2gram_n"),
        round(lit(1.0) - col("d3").cast("double") / col("n3").cast("double"), 4)
          .as("dup_3gram_frac"))
  }

  /** Benchmark-contamination check: count the distinct `n`-gram overlaps
    * of every corpus doc against a (small) benchmark set — the
    * decontamination pass every training corpus needs. The benchmark
    * n-gram set is broadcast (it is eval-suite sized); the corpus is
    * scanned once. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String = "text", n: Int = 8): DataFrame = {
    val corpusGrams = withShingles(corpus, textCol, n)
      .select(col("doc_id"), explode(col("shingles")).as("g"))
    val benchGrams = withShingles(benchmark, textCol, n)
      .select(explode(col("shingles")).as("g")).distinct()
    val hits = corpusGrams.join(broadcast(benchGrams), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    corpus.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** Rolling polynomial hash over character codes, plus the minimum
    * token hash (the winnowing primitive) — engine-specific (rows-only
    * check), both as native codegen expressions
    * ([[graft.functions.RollingHash]]/[[graft.functions.TokenMinHash]]).
    *
    * The earlier declarative form — `aggregate` over per-char
    * `regexp_extract_all` and `array_min` over per-window `slice`
    * minima — ran its lambdas interpreted (3.2 s at sf0.1, 12 s at sf1);
    * and since consecutive windows tile the token sequence, the min of
    * window minima IS the global token-hash min, so the window loop
    * collapses to one pass. A full winnowing fingerprint (the SET of
    * per-window minima) would keep the window structure; this operator
    * is the scalar sketch used for cheap similarity bucketing. */
  def rollingFingerprint(docs: DataFrame, textCol: String = "text",
                         window: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    docs
      .withColumn("rolling_hash",
        graft.functions.TextHashFunctions.rolling_hash(spark, col(textCol)))
      .withColumn("winnow_min",
        graft.functions.TextHashFunctions.token_min_hash(spark, lower(col(textCol))))
  }
}
