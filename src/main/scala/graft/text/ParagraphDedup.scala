package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document deduplication with reassembly — the CCNet/RefinedWeb
  * curation step BELOW document granularity: crawled corpora repeat
  * boilerplate paragraphs (navigation, licenses, quoted intros) across
  * documents that are NOT duplicates of each other, so whole-document
  * dedup ([[graft.dedup.Dedup]]) keeps them and span detection
  * ([[SpanIndex]]) only reports them. This operator REMOVES them: split
  * every document into normalized paragraphs, keep exactly the first
  * occurrence of each distinct paragraph corpus-wide (min (doc_id, idx)
  * — deterministic, append-stable), and reassemble every document from
  * its surviving paragraphs in original order.
  *
  * Paragraph unit: consecutive [[chunkTokens]]-token windows of THE
  * tokenizer's output ([[TextOps.tokens]] — the one pattern every text
  * operator and oracle shares; the synthetic corpus carries no explicit
  * paragraph breaks, and fixed token windows are the same normalization
  * real pipelines apply after boilerplate splitting). The last window
  * of a document may be shorter.
  *
  * Scale shape: ONE hash shuffle. Tokenize+window is a pure projection;
  * ownership is a `row_number` window over the paragraph hash (state =
  * one counter per distinct paragraph, never the paragraph text — the
  * hash rides the shuffle, `md5(para)` is computed in the map stage);
  * reassembly is the per-document aggregate, which re-uses the SAME
  * shuffle layout when the planner colocates (doc_id) groups. Nothing
  * is pairwise: a paragraph duplicated K× costs K shuffle rows — at
  * sf10's 100×-replicated corpus ownership classes are 100-wide and
  * the cost stays linear in corpus size, the property the banded dedup
  * kernels buy with canonicalization and this one gets for free from
  * the groupBy.
  */
object ParagraphDedup {

  /** `(doc_id, idx, para)` — every document's normalized paragraphs in
    * order, via the native [[graft.functions.ParagraphWindows]]
    * expression: one JVM tokenize-and-window loop per row. The first
    * cut was declarative (CASE over size + transform/slice of a bound
    * token-array alias) and CollapseProject inlined the FULL tokenize
    * into every window reference — measured at sf10 as a 2-task stage
    * re-tokenizing each row ~100× (the shingleExpr lesson, re-learned).
    * The input also repartitions BY COLUMN first (round-10
    * parallelism-collapse discipline): the tokenize loop is the
    * CPU-heavy step and otherwise runs on however few splits the
    * source arrived with; by-column, no explicit width, so the
    * exchange is AQE-coalescible and a small corpus folds back to few
    * tasks — the bytes moved are the same the ownership shuffle moves
    * right after. */
  def paragraphs(docs: DataFrame, chunkTokens: Int = 20,
                 textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), col(textCol))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        posexplode(graft.functions.TextShingleFunctions.paragraph_windows(
          docs.sparkSession, lower(col(textCol)), chunkTokens))
          .as(Seq("idx", "para")))

  /** Per-document dedup census after corpus-wide paragraph ownership:
    * `(doc_id, n_paras, n_kept, kept_tokens, removed_frac, text_fp)`
    * where `text_fp` is the md5 of the REASSEMBLED document (surviving
    * paragraphs, original order, single-space joined) — the oracle pins
    * the exact post-dedup text of every document, not just counts, and
    * `kept_tokens` is the surviving token mass (what a downstream
    * curation funnel budgets by). */
  def dedup(docs: DataFrame, chunkTokens: Int = 20,
            textCol: String = "text"): DataFrame = {
    val p = paragraphs(docs, chunkTokens, textCol)
      .withColumn("__h", md5(col("para")))
    // first occurrence corpus-wide owns the paragraph; (doc_id, idx) is
    // a total order, so ownership is deterministic on any layout
    val own = Window.partitionBy(col("__h")).orderBy(col("doc_id"), col("idx"))
    p.withColumn("__rn", row_number().over(own))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(col("__rn") === 1, lit(1))).as("n_kept"),
        coalesce(sum(when(col("__rn") === 1,
          size(split(col("para"), " ")).cast("long"))), lit(0L))
          .as("kept_tokens"),
        array_join(expr(
          """transform(
            |  array_sort(collect_list(CASE WHEN __rn = 1
            |                               THEN struct(idx, para) END)),
            |  s -> s.para)""".stripMargin), " ").as("__text"))
      .select(col("doc_id"), col("n_paras"), col("n_kept"), col("kept_tokens"),
        round(lit(1.0) - col("n_kept").cast("double") / col("n_paras"), 4)
          .as("removed_frac"),
        md5(col("__text")).as("text_fp"))
  }
}
