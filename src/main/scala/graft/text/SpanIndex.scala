package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental span-statistics index — the growing-corpus face of
  * [[graft.analytics.Queries.textSpanDedup]] (and the span machinery
  * behind `corpus_overlap`): a corpus that gains a batch of documents
  * per day should pay O(batch tokens), not O(corpus tokens), to keep
  * its cross-document span statistics current.
  *
  * The state is a persisted index of PER-BATCH PER-SPAN partial
  * aggregates: `(span_hash BINARY(16), occ LONG, docs LONG)` — one row
  * per distinct span per batch, stored as a BUCKETED catalog table
  * clustered by `span_hash` (the [[graft.dedup.IncrementalDedup]]
  * discipline applied to span counting). Two facts make the partials
  * mergeable by plain addition:
  *
  *   1. `occ` is a count — counts sum across any partition of the data;
  *   2. `docs` is a count of DISTINCT documents, which sums ONLY
  *      because batches are document-disjoint (each document is
  *      ingested exactly once, append-only corpus — the same invariant
  *      every ingest path in this repo maintains). A document split
  *      across batches would double-count; [[appendBatch]] documents
  *      the contract.
  *
  * Per-batch cost: shingle+hash the NEW documents only (per-row
  * codegen, the `text_span_dedup` expression), one O(batch tokens)
  * shuffle for the batch's own per-span partials, one bucket-preserving
  * append. The historical corpus is never re-read, let alone re-hashed.
  *
  * Query cost: [[perSpanTotals]] folds the partials with a
  * `groupBy(span_hash)` that the bucket layout satisfies — the index
  * scans in bucket order and the per-span aggregate runs with ZERO
  * exchanges above the scan (spec-pinned). The only exchange in
  * [[stats]] is the final 1-row SinglePartition collapse.
  *
  * At 100 TB: the index holds one row per (batch, distinct span) —
  * bounded by total tokens but typically far smaller (spans repeat);
  * periodic compaction (fold all batches' partials into one row per
  * span via the same zero-exchange aggregate, rewrite bucketed) keeps
  * it near O(distinct spans). Bucket fan-out scales with
  * O(index bytes / target partition size), as with the LSH index.
  */
object SpanIndex {

  /** Bucket fan-out of the index table. Local tests use few; a 100 TB
    * corpus index would size this to the span-partial volume. */
  val IndexBuckets = 8

  /** Per-span partial aggregates of ONE batch of documents: distinct
    * span → (occurrence count, distinct-doc count). The shingle hash is
    * the exact `text_span_dedup` law — every 8-word window, md5 of the
    * space-joined words, grouped on the 16-byte digest (half the
    * shuffle width of the hex string). */
  def batchSpanPartials(docs: DataFrame, k: Int = 8): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokenize(col("text")).as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, n - $k), i -> unhex(md5(array_join(slice(w, i + 1, $k), ' '))))"
      )).as("span_hash"))
      .groupBy("span_hash")
      .agg(count(lit(1)).as("occ"),
        count_distinct(col("doc_id")).as("docs"))

  /** Create the index from an initial corpus (one-time backfill): a
    * parquet catalog table at `path`, bucketed+sorted by `span_hash`. */
  def initIndex(docs: DataFrame, indexTable: String, path: String,
                k: Int = 8): Unit =
    graft.etl.Bucketing.writeBucketed(
      batchSpanPartials(docs, k), indexTable, path, "span_hash", IndexBuckets)

  /** Append one batch's span partials, preserving the bucket layout.
    * CONTRACT: `docs` must be disjoint (by document) from every batch
    * already in the index — the `docs` partial is a distinct-document
    * count and sums correctly only across document-disjoint batches. */
  def appendBatch(docs: DataFrame, indexTable: String, k: Int = 8): Unit =
    batchSpanPartials(docs, k).write.mode("append")
      .format("parquet")
      .bucketBy(IndexBuckets, "span_hash")
      .sortBy("span_hash")
      .saveAsTable(indexTable)

  /** Current per-span totals `(span_hash, n_occ, n_docs)` — the
    * `text_span_dedup` per-span frame, folded from the partials. The
    * bucket layout satisfies the groupBy's distribution requirement, so
    * this aggregate runs with no exchange above the index scan. */
  def perSpanTotals(spark: SparkSession, indexTable: String): DataFrame =
    spark.table(indexTable)
      .groupBy("span_hash")
      .agg(sum(col("occ")).as("n_occ"), sum(col("docs")).as("n_docs"))

  /** Corpus-level span statistics — schema-identical to
    * `text_span_dedup`'s output, but computed from the index instead of
    * a full-corpus re-hash. */
  def stats(spark: SparkSession, indexTable: String): DataFrame =
    perSpanTotals(spark, indexTable).agg(
      count(lit(1)).as("n_distinct_spans"),
      sum(col("n_occ")).as("n_span_instances"),
      sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_cross_doc_spans"),
      max(col("n_docs")).as("max_span_doc_freq"))

  // ------------------------------------------------- source-span index
  // The same discipline applied to `corpus_overlap` (#105): a persisted
  // bucketed index of DISTINCT (span, source) rows makes the pairwise
  // contamination measure incremental — each batch contributes its own
  // distinct set (O(batch tokens)), and the overlap query's heavy
  // stages all ride the bucket layout: the cross-batch dedup fold is a
  // groupBy(span, source) that HashPartitioning(span) already satisfies
  // (subset clustering), and the pair SELF-JOIN on the span key joins
  // the bucketed scan with itself — co-located, no exchange on either
  // side. The only shuffles left are the O(distinct spans) per-source
  // sizes aggregate and the O(shared spans) pair rollup — both outputs,
  // not corpus.

  /** Distinct (span_hash, source) rows of ONE batch. Unlike the count
    * partials, cross-batch duplicates are expected (the same source
    * repeats a span in two batches) — [[dedupedSourceSpans]] folds them. */
  def batchSourceSpans(docs: DataFrame, k: Int = 8): DataFrame =
    docs
      .select(col("source"), TextOps.tokenize(col("text")).as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") >= k)
      .select(col("source"), explode(expr(
        s"transform(sequence(0, n - $k), i -> unhex(md5(array_join(slice(w, i + 1, $k), ' '))))"
      )).as("span_hash"))
      .distinct()

  def initSourceIndex(docs: DataFrame, indexTable: String, path: String,
                      k: Int = 8): Unit =
    graft.etl.Bucketing.writeBucketed(
      batchSourceSpans(docs, k), indexTable, path, "span_hash", IndexBuckets)

  def appendSourceBatch(docs: DataFrame, indexTable: String, k: Int = 8): Unit =
    batchSourceSpans(docs, k).write.mode("append")
      .format("parquet")
      .bucketBy(IndexBuckets, "span_hash")
      .sortBy("span_hash")
      .saveAsTable(indexTable)

  /** The corpus-wide distinct (span, source) set, folded from per-batch
    * partials with no exchange above the index scan (bucket layout on
    * `span_hash` satisfies the grouping's distribution). */
  def dedupedSourceSpans(spark: SparkSession, indexTable: String): DataFrame =
    spark.table(indexTable).groupBy("span_hash", "source").agg(lit(1))
      .select("span_hash", "source")

  /** `corpus_overlap`'s exact output, computed from the index: shared
    * spans + Jaccard per source pair. The self-join reads the SAME
    * bucketed scan on both sides — co-located on `span_hash`, no join
    * exchange. */
  def overlap(spark: SparkSession, indexTable: String): DataFrame = {
    val spans = dedupedSourceSpans(spark, indexTable)
    val sizes = spans.groupBy("source").agg(count(lit(1)).as("n_spans"))
    val pairs = spans.as("a")
      .join(spans.as("b"), col("a.span_hash") === col("b.span_hash"))
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("source").as("source_a"), col("n_spans").as("n_a")),
        Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("n_spans").as("n_b")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared") / (col("n_a") + col("n_b") - col("n_shared")), 4)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }
}
