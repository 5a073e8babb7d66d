package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Exact corpus heavy hitters at sketch cost — the two-pass
  * Misra–Gries pattern ([[graft.functions.MisraGries]] carries the
  * theory): pass 1 reduces the whole token stream to one O(k) summary
  * whose keys are a GUARANTEED superset of every token with frequency
  * ≥ N/thresholdDen; pass 2 exactly re-counts just those ≤k candidates
  * and applies the threshold on true counts.
  *
  * The naive form — `explode → groupBy(token) → count → filter` —
  * shuffles one row per token OCCURRENCE and materializes the full
  * Zipf-tailed vocabulary histogram to keep a handful of rows. Here the
  * token stream is never shuffled: pass 1 is a partial-aggregating
  * single-group fold to O(k × partitions) state, and pass 2's shuffle
  * carries only occurrences of the ≤k candidate tokens (the broadcast
  * semi-join filters BEFORE the exchange). Output is EXACT and
  * deterministic — the sketch's internal contents vary with
  * partitioning, but any superset of candidates re-counts to the same
  * final set, which is what makes this oracle-checkable row-for-row
  * against a full DuckDB histogram. */
object FrequentTokens {

  /** Tokens (shared unicode tokenizer, case-folded) with exact frequency
    * `freq` satisfying `freq * thresholdDen >= n_tokens`, ordered by
    * descending frequency. `k` must exceed `thresholdDen` for the MG
    * superset guarantee to cover the threshold (enforced). */
  def frequentTokens(docs: DataFrame, thresholdDen: Int = 200,
                     k: Int = 400): DataFrame = {
    require(k >= thresholdDen,
      s"mg k ($k) must be >= thresholdDen ($thresholdDen): items at the " +
      "threshold N/thresholdDen are only guaranteed to survive a k-counter " +
      "summary when N/thresholdDen > N/(k+1)")
    val spark = docs.sparkSession
    val toks = docs.select(TextOps.tokens(col("text")).as("toks"))
    // pass 1: ONE aggregation job → (k-counter summary, exact N)
    val sketch = graft.Caching.materialize(
      toks.agg(MisraGries.mg_sketch(spark, col("toks"), k).as("mg"),
               sum(size(col("toks"))).as("n_tokens")))
    val cands = sketch.select(explode(map_keys(col("mg"))).as("tok"))
    val total = sketch.select(col("n_tokens"))
    // pass 2: exact recount of the ≤k candidates only
    toks.select(explode(col("toks")).as("tok"))
      .join(broadcast(cands), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total)) // 1-row aggregate assembly
      .filter(col("freq") * thresholdDen >= col("n_tokens"))
      .select(col("tok"), col("freq"), col("n_tokens"))
      .orderBy(col("freq").desc, col("tok"))
  }
}
