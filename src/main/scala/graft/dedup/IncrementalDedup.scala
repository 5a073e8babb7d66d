package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Incremental corpus dedup — the production flow for a GROWING corpus:
  * each day's batch of new documents dedups against everything ingested
  * before it WITHOUT re-reading (let alone re-hashing) the historical
  * corpus.
  *
  * The state is a persisted LSH band index: `(doc_id, band_idx,
  * band_hash)` rows ([[Dedup.bandsOfSignatures]]'s format, `Bands` rows
  * per document — O(docs) metadata, tiny next to the text), stored as a
  * BUCKETED catalog table clustered by `band_hash`. Bucketing is the
  * load-bearing choice: the per-batch candidate join reads the index
  * through its bucket layout (HashPartitioning on `band_hash`), so only
  * the SMALL batch side shuffles — round 4 stored the index in a txlog
  * table and re-shuffled the ENTIRE O(corpus × bands) index on every
  * batch, which at 100 TB is a nightly corpus-sized shuffle for a
  * batch-sized question. The index is derived data (rebuildable from the
  * corpus by [[initIndex]]), so bucket co-location is worth more here
  * than the txlog's versioned snapshots.
  *
  * `band_hash` already encodes the band ordinal (it is
  * `xxhash64(band values..., band_idx)`), so the join needs only the one
  * bucketed key; cross-band 64-bit collisions are possible in principle
  * but land in the exact-verify stage like any other candidate.
  *
  * A batch is processed as:
  *   1. shingle + minhash + band the NEW docs only (per-row codegen,
  *      zero shuffle);
  *   2. candidates = new bands ⋈ index bands on `band_hash` — the index
  *      side scans in bucket order with NO shuffle, the batch side
  *      shuffles O(batch bands) into the bucket layout; plus the
  *      intra-batch self-join;
  *   3. exact n-gram Jaccard verify: the historical TEXT is read only
  *      for matched candidate docs (semi-join pruning; with the doc
  *      store in a txlog table, min/max + bloom skipping cut that to
  *      the files holding them);
  *   4. the batch's bands are APPENDED to the index (bucket spec
  *      preserved), so the next batch dedups against this one too.
  * Per-batch cost is O(batch + candidates) on every side of every join —
  * the index contributes a co-located scan, never a shuffle.
  *
  * Pair orientation is (new_doc, matched_doc): the new document matches
  * an older one — for intra-batch pairs "older" is the smaller doc_id,
  * mirroring keep-first dedup. */
object IncrementalDedup {

  /** Bucket fan-out of the index table. Local tests use few; a 100 TB
    * corpus index would use O(corpus bands / target partition size). */
  val IndexBuckets = 8

  /** LSH index rows for a document frame. */
  def bands(docs: DataFrame, textCol: String = "text"): DataFrame =
    Dedup.bandsOfSignatures(Dedup.minhashSignatures(docs, textCol))

  /** Create the index table from the current corpus (one-time backfill):
    * a parquet catalog table at `path`, bucketed+sorted by `band_hash`. */
  def initIndex(docs: DataFrame, indexTable: String, path: String,
                textCol: String = "text"): Unit =
    graft.etl.Bucketing.writeBucketed(
      bands(docs, textCol), indexTable, path, "band_hash", IndexBuckets)

  /** Candidate (new_doc, matched_doc) pairs of `newBands` against the
    * bucketed index, EXCLUDING index rows whose doc_id is in the batch
    * itself (`batchIds`). The exclusion makes the result independent of
    * whether this batch's own bands have been appended yet — correctness
    * never rides on file-listing snapshot timing — and it is a broadcast
    * anti-join, so the index side's bucket partitioning flows through to
    * the candidate join unshuffled. */
  private[graft] def candidatesVsIndex(spark: SparkSession, newBands: DataFrame,
                                       batchIds: DataFrame,
                                       indexTable: String): DataFrame = {
    val indexBands = spark.table(indexTable)
      .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
    newBands.as("n").join(indexBands.as("o"),
        col("n.band_hash") === col("o.band_hash"))
      .select(col("n.doc_id").as("new_doc"), col("o.doc_id").as("matched_doc"))
  }

  /** Verified near-dup pairs of `batch` against the index (historical
    * corpus) and against earlier docs of the batch itself; exact
    * word-3-gram Jaccard ≥ `minJaccard`. Appends the batch's bands to
    * the index (bucket spec preserved) so the next batch sees them.
    * `corpusText` supplies text for matched historical docs only
    * (pruned by a semi join on the candidate ids). */
  def dedupBatch(batch: DataFrame, corpusText: DataFrame, indexTable: String,
                 textCol: String = "text",
                 minJaccard: Double = 0.2): DataFrame = {
    val newBands = graft.Caching.materialize(bands(batch, textCol))
    val verified = pairsWithBands(batch, newBands, corpusText, indexTable,
      textCol, minJaccard)
    // index grows by exactly this batch; next batch sees it (the batch-id
    // anti-join in candidatesVsIndex keeps THIS batch's results
    // append-timing-proof)
    appendToIndex(newBands, indexTable)
    verified
  }

  /** The pure half of [[dedupBatch]]: verified pairs of `batch` against
    * the index and itself, with NO side effect on the index. The result
    * is identical whether or not this batch's own bands have already
    * been appended (the batch-id anti-join in [[candidatesVsIndex]]),
    * which is what makes a replayed micro-batch recompute byte-identical
    * output. */
  private def pairsWithBands(batch: DataFrame, newBands: DataFrame,
                             corpusText: DataFrame, indexTable: String,
                             textCol: String, minJaccard: Double): DataFrame = {
    val spark = batch.sparkSession
    val batchIds = batch.select(col("doc_id"))
    // candidates vs history: every index doc (batch ids excluded) is older
    val vsIndex = candidatesVsIndex(spark, newBands, batchIds, indexTable)
    // candidates inside the batch: older = smaller id (keep-first)
    val vsBatch = newBands.as("a").join(newBands.as("b"),
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
    verified
  }

  /** True iff any of `batch`'s documents already have band rows in the
    * index — i.e. a previous (possibly crashed-after-append) run of this
    * same batch landed its bands. One broadcast semi probe with
    * `limit(1)` early-out; the index side is a plain bucket-ordered scan,
    * no shuffle. */
  private[graft] def indexHasBatch(batch: DataFrame, indexTable: String): Boolean =
    !batch.sparkSession.table(indexTable)
      .join(broadcast(batch.select(col("doc_id"))), Seq("doc_id"), "left_semi")
      .isEmpty

  /** EXACTLY-ONCE micro-batch apply for the streaming face: both side
    * effects of a batch are keyed by the replayable `batchId` that
    * `foreachBatch` supplies, so a crash between them and the checkpoint
    * commit cannot duplicate data when the stream restarts and
    * re-delivers the batch:
    *
    *   - verified pairs land at `outDir/batch=<id>` with OVERWRITE — a
    *     replay rewrites the same partition instead of appending a second
    *     copy (and recomputes the same rows: [[pairsWithBands]] is
    *     append-timing-proof);
    *   - the band append is guarded by [[indexHasBatch]] — if the first
    *     attempt's append committed before the crash, the replay skips it
    *     instead of double-inserting the batch's bands.
    *
    * Spark's file-commit protocol makes each individual write atomic
    * (uncommitted task output is never visible), so every crash point
    * leaves the pair partition either absent or complete and the index
    * either without or with the batch's bands — all four states replay to
    * the same final state. */
  def applyBatchExactlyOnce(batch: DataFrame, corpusText: DataFrame,
                            indexTable: String, batchId: Long, outDir: String,
                            textCol: String = "text",
                            minJaccard: Double = 0.2): Unit = {
    val newBands = graft.Caching.materialize(bands(batch, textCol))
    pairsWithBands(batch, newBands, corpusText, indexTable, textCol, minJaccard)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    if (!indexHasBatch(batch, indexTable)) appendToIndex(newBands, indexTable)
  }

  /** Append band rows into the bucketed index, preserving its layout. */
  private def appendToIndex(bands: DataFrame, indexTable: String): Unit =
    bands.write.mode("append")
      .format("parquet")
      .bucketBy(IndexBuckets, "band_hash")
      .sortBy("band_hash")
      .saveAsTable(indexTable)
}
