package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.acid.TxLog
import graft.text.TextOps

/** Incremental corpus dedup — the production flow for a GROWING corpus:
  * each day's batch of new documents dedups against everything ingested
  * before it WITHOUT re-reading (let alone re-hashing) the historical
  * corpus.
  *
  * The state is a persisted LSH band index: an ACID table of
  * `(doc_id, band_idx, band_hash)` rows ([[Dedup.bandsOfSignatures]]'s
  * format, `Bands` rows per document — O(docs) metadata, tiny next to
  * the text). A batch is processed as:
  *   1. shingle + minhash + band the NEW docs only (per-row codegen,
  *      zero shuffle);
  *   2. candidates = new bands ⋈ index bands on (band_idx, band_hash)
  *      — a shuffle of O(batch bands + index bands touched), plus the
  *      intra-batch self-join;
  *   3. exact n-gram Jaccard verify: the historical TEXT is read only
  *      for matched candidate docs (semi-join pruning; with the doc
  *      store in a txlog table, min/max + bloom skipping cut that to
  *      the files holding them);
  *   4. the batch's bands are APPENDED to the index in one transaction,
  *      so the next batch dedups against this one too.
  * Per-batch cost is O(batch + candidates), never O(corpus) — at 100 TB
  * the alternative (re-run corpus-wide LSH nightly) rescans everything
  * to discover pairs that can only involve new documents.
  *
  * Pair orientation is (new_doc, matched_doc): the new document matches
  * an older one — for intra-batch pairs "older" is the smaller doc_id,
  * mirroring keep-first dedup. */
object IncrementalDedup {

  /** LSH index rows for a document frame. */
  def bands(docs: DataFrame, textCol: String = "text"): DataFrame =
    Dedup.bandsOfSignatures(Dedup.minhashSignatures(docs, textCol))

  /** Create the index table from the current corpus (one-time backfill). */
  def initIndex(docs: DataFrame, indexTable: String,
                textCol: String = "text"): Unit =
    TxLog.overwrite(bands(docs, textCol), indexTable)

  /** Verified near-dup pairs of `batch` against the index (historical
    * corpus) and against earlier docs of the batch itself; exact
    * word-3-gram Jaccard ≥ `minJaccard`. Appends the batch's bands to
    * the index transactionally — the candidate scan is pinned to the
    * PRE-append snapshot, so a doc never matches itself through the
    * index. `corpusText` supplies text for matched historical docs only
    * (pruned by a semi join on the candidate ids). */
  def dedupBatch(batch: DataFrame, corpusText: DataFrame, indexTable: String,
                 textCol: String = "text",
                 minJaccard: Double = 0.2): DataFrame = {
    val spark = batch.sparkSession
    val newBands = graft.Caching.materialize(bands(batch, textCol))
    val indexBands = TxLog.read(spark, indexTable) // pre-append snapshot
    // candidates vs history: every index doc is by definition older
    val vsIndex = newBands.as("n").join(indexBands.as("o"),
        col("n.band_idx") === col("o.band_idx") &&
        col("n.band_hash") === col("o.band_hash"))
      .select(col("n.doc_id").as("new_doc"), col("o.doc_id").as("matched_doc"))
    // candidates inside the batch: older = smaller id (keep-first)
    val vsBatch = newBands.as("a").join(newBands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("b.doc_id").as("new_doc"), col("a.doc_id").as("matched_doc"))
    val cands = vsIndex.unionByName(vsBatch)
      .dropDuplicates("new_doc", "matched_doc")
    // exact verify: batch text is at hand; historical text only for
    // matched docs (semi-join pruned read of the doc store)
    val newSh = TextOps.withShingles(batch, textCol, 3)
      .select(col("doc_id").as("new_doc"), col("shingles").as("sh_n"))
    val matchedIds = cands.select(col("matched_doc").as("doc_id")).distinct()
    // a matched doc is historical (text from the doc store) or an earlier
    // doc of this same batch — one pruned union covers both
    val matchedText = corpusText.select(col("doc_id"), col(textCol))
      .unionByName(batch.select(col("doc_id"), col(textCol)))
      .join(matchedIds, Seq("doc_id"), "left_semi")
    val oldSh = TextOps.withShingles(matchedText, textCol, 3)
      .select(col("doc_id").as("matched_doc"), col("shingles").as("sh_o"))
    val verified = cands
      .join(newSh, Seq("new_doc"))
      .join(oldSh, Seq("matched_doc"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_n"), col("sh_o"))).cast("double") /
          size(array_union(col("sh_n"), col("sh_o"))).cast("double"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("new_doc", "matched_doc", "jaccard")
    // index grows by exactly this batch; next batch sees it
    TxLog.append(newBands, indexTable)
    verified
  }
}
