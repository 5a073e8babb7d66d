package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming CDC upsert into the ACID consumer table — the
  * `foreachBatch` + MERGE pattern Delta users run for change feeds
  * (the streaming face of the reference's consumer write,
  * process_data_glue.py:186-190).
  *
  * Each micro-batch becomes ONE transactional [[graft.acid.TxLog.merge]]
  * commit: matched keys update wholesale, new keys insert, and only the
  * files holding matched keys rewrite — a steady CDC trickle costs
  * per-batch O(touched files), never a table rewrite. Within-batch
  * replays collapse on the merge key first (at-least-once delivery must
  * not double-apply a correction). Exactly-once across restarts comes
  * from the checkpoint: a replayed batch re-MERGEs the same rows, and
  * upserts are idempotent on the key.
  */
object StreamMerge {

  /** Drive `cdcBatches` through a file-source stream into `table`, one
    * MERGE commit per micro-batch (batch boundaries are forced by
    * feeding the source incrementally, mirroring a real trickle). The
    * table must already exist ([[graft.acid.TxLog.overwrite]] first). */
  def upsertStream(spark: SparkSession, cdcBatches: Seq[DataFrame],
                   table: String, keyCols: Seq[String]): Unit = {
    require(cdcBatches.nonEmpty, "need at least one CDC batch")
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val dir = s"$base/src"
    cdcBatches.head.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.acid.TxLog.merge(
            batch.dropDuplicates(keyCols), table, keyCols)
          ()
        }
      }
      .start()
    try {
      q.processAllAvailable()
      cdcBatches.tail.foreach { b =>
        b.write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
    } finally q.stop()
  }
}
