package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the step between a cleaned corpus and
  * a training run: documents are packed in stable doc_id order into
  * shards of ~`budget` tokens (a document never splits; a shard may
  * exceed the budget by less than one document, the standard streaming
  * pack). Shard assignment is a pure function of the corpus, so a
  * re-run, a different cluster, or a different partitioning produces
  * the SAME shards — the property that makes training jobs resumable
  * and data ablations comparable.
  *
  * The assignment needs a GLOBAL running token sum. A bare
  * `Window.orderBy(doc_id)` with no partition key computes it on ONE
  * task — the classic scale trap. This is instead the textbook
  * distributed prefix sum:
  *   1. bucket documents by `doc_id div bucketSize` and aggregate one
  *      token sum per bucket (one map-side-combined shuffle);
  *   2. cumulate the O(n_docs / bucketSize) bucket sums on the driver —
  *      bounded METADATA, like IVF centroids (pick bucketSize so this
  *      stays ~1e6 rows at any corpus size);
  *   3. broadcast the bucket offsets back and finish with an
  *      intra-bucket running sum (`Window.partitionBy(bucket)` — fully
  *      parallel).
  * Every document's global prefix is exactly `bucket_offset +
  * intra-bucket running sum`, bit-equal to the single-partition window,
  * which is what the SQL oracle computes. */
object Packing {

  /** (doc_id, n_tokens, shard_id): shard = floor(prefix_before / budget)
    * over whitespace token counts in doc_id order. */
  def packByTokenBudget(docs: DataFrame, budget: Long,
                        bucketSize: Long = 1024L): DataFrame = {
    require(budget > 0 && bucketSize > 0)
    val spark = docs.sparkSession
    val t = docs.select(col("doc_id"),
        size(TextOps.tokenize(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"doc_id div $bucketSize"))
    // (2) driver-side cumsum over bucket sums — O(corpus / bucketSize)
    val bucketSums = t.groupBy("bucket").agg(sum("n_tokens").as("bsum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = bucketSums.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (bkt, bsum)) => (bkt, acc + bsum)
    }.tail.zip(bucketSums).map { case ((bkt, cumEnd), (_, bsum)) =>
      (bkt, cumEnd - bsum) // offset BEFORE this bucket
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("bucket", "bucket_offset")
    // (3) intra-bucket running sum rides a PARTITIONED window
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(offDf), Seq("bucket"))
      .withColumn("before",
        col("bucket_offset") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("shard_id", expr(s"before div $budget"))
      .select("doc_id", "n_tokens", "shard_id")
  }

  /** Per-shard packing report: document count and token total. */
  def shardStats(packed: DataFrame): DataFrame =
    packed.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
      .orderBy("shard_id")
}
