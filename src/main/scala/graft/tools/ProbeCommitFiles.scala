package graft.tools

import org.apache.spark.sql.functions._

/** Commit file-count evidence for the r16 "optimized write" claim
  * (VERDICT r16 next-round #3): stages the consumer table like the
  * delta_merge family does, runs one incremental MERGE, and prints the
  * add/cdc action counts PER COMMIT straight from the txlog — the
  * quantity the optimized write bounds (pre-r16, a few-MB merge commit
  * sprayed 33 files). Leaves the table at a fixed path so the log can
  * be inspected afterwards. Usage: ProbeCommitFiles <sfDir> <outTable>. */
object ProbeCommitFiles {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val path = if (args.length > 1) args(1) else "/tmp/pcf_table"
    val spark = graft.GraftSession.builder("probe-cf", "local[32]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = graft.etl.ConsumerPipeline.consumer(spark, dir)
      .select("event_id", "passenger_count", "total_amount",
              "trip_type", "trip_year", "trip_month")
    graft.acid.TxLog.overwrite(c, path,
      Seq("trip_type", "trip_year", "trip_month"))
    // incremental merge: update a slice + insert new keys (delta_merge's
    // shape) — the copy-on-write commit whose file count the optimized
    // write bounds
    val upd = c.filter(col("event_id") % 7 === 0)
      .withColumn("total_amount", col("total_amount") + 1)
    val ins = c.filter(col("event_id") % 13 === 0)
      .withColumn("event_id", -col("event_id") - 1)
    graft.acid.TxLog.merge(upd.unionByName(ins), path, Seq("event_id"))
    // per-commit action counts from the log itself
    val logDir = new java.io.File(path, "_txlog")
    logDir.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)
      .foreach { f =>
        val lines = scala.io.Source.fromFile(f).getLines().toSeq
        val adds = lines.count(_.startsWith("{\"add\""))
        val cdcs = lines.count(_.startsWith("{\"cdc\""))
        val removes = lines.count(_.startsWith("{\"remove\""))
        println(s"${f.getName}: adds=$adds cdc=$cdcs removes=$removes")
      }
    spark.stop()
  }
}
