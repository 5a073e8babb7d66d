package graft.tools

import org.apache.spark.sql.functions._

/** Per-micro-batch cost breakdown for the stream-stream join scenarios
  * (optimization r17 — VERDICT r16 #1): re-runs the
  * runStreamStreamOuterTyped shape with phase wall-timers and dumps
  * every StreamingQueryProgress's durationMs map + state-operator
  * metrics, so the fixed costs (planning, wal commits, state commits)
  * are measured instead of guessed. 2 passes, second reported. */
object ProbeStreamJoin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val joinType = if (args.length > 1) args(1) else "left_outer"
    // optional conf overrides: PROBE_CONF="k=v;k=v"
    val spark = sys.env.get("PROBE_CONF").toSeq
      .flatMap(_.split(';')).map(_.split('=')).filter(_.length == 2)
      .foldLeft(graft.GraftSession.builder("probe-ssj", "local[32]", 32)) {
        case (b, Array(k, v)) => b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    (0 until 2).foreach { round =>
      def t[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        if (round == 1) println(f"  ${(System.nanoTime() - t0) / 1e9}%6.2fs  $name")
        r
      }
      val base = java.nio.file.Files.createTempDirectory("pssj").toString
      val ev = t("events scan+normalize(lazy)") {
        graft.Tables.normalizeTs(
          graft.Tables.events(spark, dir)
            .select("user_id", "ts", "event_type", "value"), "ts") }
      t("stage clicks") {
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"))
          .write.mode("overwrite").parquet(s"$base/clicks") }
      t("stage purch") {
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
            col("value"))
          .write.mode("overwrite").parquet(s"$base/purch") }
      val clicksStaged = spark.read.parquet(s"$base/clicks")
      val cSchema = clicksStaged.schema
      val pSchema = spark.read.parquet(s"$base/purch").schema
      val maxTs = t("maxTs collect") {
        clicksStaged.agg(max(col("click_ts"))).collect()(0).getTimestamp(0) }
      val q = graft.streaming.StateSizing.withStatePartitions(spark, 10000L) {
        val cs = spark.readStream.schema(cSchema).parquet(s"$base/clicks")
          .withWatermark("click_ts", "1 hour")
        val ps = spark.readStream.schema(pSchema).parquet(s"$base/purch")
          .withWatermark("purchase_ts", "1 hour")
        val joined = cs.join(ps, expr(
          "user_id = p_user AND purchase_ts >= click_ts AND " +
            "purchase_ts <= click_ts + interval 1 hour"), joinType)
        val query = t("query start") {
          joined.writeStream.outputMode("append")
            .option("checkpointLocation", s"$base/ckpt")
            .format("parquet").option("path", s"$base/out")
            .start() }
        t("processAllAvailable (data)") { query.processAllAvailable() }
        Seq(30, 60).foreach { days =>
          val ts = new java.sql.Timestamp(maxTs.getTime + days * 86400000L)
          t(s"sentinel writes +${days}d") {
            Seq((Long.MinValue, ts)).toDF("user_id", "click_ts")
              .write.mode("append").parquet(s"$base/clicks")
            Seq((Long.MinValue, ts, 0.0)).toDF("p_user", "purchase_ts", "value")
              .write.mode("append").parquet(s"$base/purch") }
          t(s"processAllAvailable +${days}d") { query.processAllAvailable() }
        }
        t("stop") { query.stop() }
        query
      }
      val agg = t("final agg collect") {
        spark.read.parquet(s"$base/out")
          .filter((col("user_id").isNull || col("user_id") =!= Long.MinValue) &&
                  (col("p_user").isNull || col("p_user") =!= Long.MinValue))
          .agg(count(lit(1))).collect()(0).getLong(0) }
      if (round == 1) {
        println(s"  rows=$agg")
        q.recentProgress.foreach { p =>
          val d = p.durationMs
          println(s"  batch ${p.batchId}: in=${p.numInputRows} " +
            s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
            s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
            s"queryPlanning=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
            s"commitOffsets=${d.get("commitOffsets")}")
          Option(p.stateOperators).foreach(_.foreach { so =>
            println(s"    state: rowsTotal=${so.numRowsTotal} " +
              s"updated=${so.numRowsUpdated} commitMs=${so.commitTimeMs} " +
              s"mem=${so.memoryUsedBytes}")
          })
        }
      }
    }
    spark.stop()
  }
}
