package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.IncrementalDedup

/** The streaming face of incremental corpus dedup: a document stream is
  * deduped micro-batch by micro-batch against the persisted (bucketed)
  * LSH band index — exactly what a production ingest does between
  * landing and the consumer table. `foreachBatch` is the right hook
  * because each batch runs a full composite pipeline (LSH candidates
  * against the index, exact verify, index append) that has no
  * incremental-state expression inside a single streaming plan; the
  * per-batch work is [[IncrementalDedup.dedupBatch]] unchanged, so the
  * batch and stream paths cannot drift.
  *
  * The doc store grows with the stream: each processed batch's text
  * joins the corpus for later batches' verify stage (semi-join pruned —
  * only matched docs are ever read). Emitted pairs land in a durable
  * file sink, O(pairs) on executors, never the driver. */
object StreamIncrementalDedup {

  /** Stage `batches` as file-source drops processed IN ORDER (one
    * `processAllAvailable` per staged drop pins micro-batch
    * boundaries), dedup each against `indexTable` + the growing doc
    * store, and return all verified (new_doc, matched_doc, jaccard)
    * pairs. */
  def run(spark: SparkSession, corpusText: DataFrame, batches: Seq[DataFrame],
          indexTable: String, textCol: String = "text"): DataFrame = {
    val base = graft.TempDirs.create("sid")
    val srcDir = s"$base/src"
    val outDir = s"$base/out"
    // schema from an empty staged marker: the stream needs it up front
    val empty = batches.head.limit(0)
    empty.write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val corpusSlim = corpusText.select(col("doc_id"), col(textCol))
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // the growing doc store is the STAGED SOURCE itself (all prior
          // drops are parquet in srcDir) minus this batch's own docs — a
          // constant-depth plan per batch, not an N-way union whose
          // lineage grows with stream age
          val docStore = corpusSlim.unionByName(
            s.read.schema(schema).parquet(srcDir)
              .select(col("doc_id"), col(textCol))
              .join(broadcast(batch.select("doc_id")), Seq("doc_id"), "left_anti"))
          // per-batch frames must not accumulate in the cache manager
          // over a long-running stream: disable the signature cache for
          // this batch's cloned session (recompute is a per-row codegen
          // projection — cheap; an unreleased persist per batch is not)
          s.conf.set(graft.Caching.MaterializeKey, "false")
          IncrementalDedup.dedupBatch(batch, docStore, indexTable, textCol)
            .write.mode("append").parquet(outDir)
        }
      }
      .start()
    try {
      batches.foreach { b =>
        b.write.mode("append").parquet(srcDir)
        q.processAllAvailable() // one staged drop = one micro-batch
      }
    } finally q.stop()
    spark.read.parquet(outDir)
  }
}
