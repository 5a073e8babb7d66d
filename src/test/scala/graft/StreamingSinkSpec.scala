package graft

import org.apache.spark.sql.functions._

import graft.etl.{Compaction, ConsumerPipeline, PartitionedSink}
import graft.streaming.EventsStream

class StreamingSinkSpec extends SparkSpec {

  test("streaming parquet sink with checkpoint persists the windowed agg") {
    val in = java.nio.file.Files.createTempDirectory("graft_ssin").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ssout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssck").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    // append mode + watermark: only windows older than the watermark emit;
    // with one batch, the final windows stay open — foreachBatch variant
    // below covers exact equality, this covers the durable-sink mechanics
    val q = EventsStream.streamingHourlyAgg(spark, in, schema)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
    // durable sink mechanics: checkpoint has committed offsets, and the
    // sink directory has a streaming metadata log
    assert(new java.io.File(s"$ckpt/offsets").list().nonEmpty)
    assert(new java.io.File(s"$out/_spark_metadata").exists())
  }

  test("foreachBatch bridges the stream into the partitioned consumer sink") {
    val in = java.nio.file.Files.createTempDirectory("graft_fbin").toString
    val out = java.nio.file.Files.createTempDirectory("graft_fbout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fbck").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val typed = batch
          .withColumn("trip_year", year(col("ts")))
          .withColumn("trip_month", month(col("ts")))
        PartitionedSink.write(typed, out, Seq("event_type", "trip_year", "trip_month"))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val back = PartitionedSink.read(spark, out)
    assert(back.count() == Tables.events(spark, sf).count())
    assert(back.select("event_type").distinct().count() == 5)
  }

  test("streaming dedup drops a fully re-delivered batch") {
    val ev = Tables.events(spark, sf).select("event_id", "event_type", "user_id")
    val out = graft.streaming.StreamDedup.dedupStream(spark, Seq(ev, ev), Seq("event_id"))
    assert(out.count() == ev.count(), "replayed rows must be dropped")
    assert(out.select("event_id").distinct().count() == ev.count())
  }

  test("compaction reduces file count and preserves data") {
    val base = java.nio.file.Files.createTempDirectory("graft_comp").toString
    val c = ConsumerPipeline.consumer(spark, sf).select("event_id", "total_amount")
    c.repartition(40).write.mode("overwrite").parquet(s"$base/small")
    assert(Compaction.parquetFileCount(spark, s"$base/small") >= 30)
    val compacted = Compaction.compact(spark, s"$base/small", s"$base/big")
    assert(Compaction.parquetFileCount(spark, s"$base/big") <= 2)
    assert(compacted.count() == c.count())
    assert(compacted.agg(round(sum("total_amount"), 2)).collect()(0).getDouble(0) ==
      c.agg(round(sum("total_amount"), 2)).collect()(0).getDouble(0))
  }
}
