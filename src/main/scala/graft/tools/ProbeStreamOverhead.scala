package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Phase/job accounting for the streaming-scenario fixed overhead
  * (round-11 directive #7): re-runs the stream_scd2 scenario with a
  * job-counting listener and wall timers per phase, so the redundant
  * actions are visible instead of guessed. Run:
  * `runMain graft.tools.ProbeStreamOverhead /root/testdata/sf0.1` */
object ProbeStreamOverhead {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("probe-soh", "local[32]", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val verbose = sys.env.contains("PROBE_JOBS")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) println(s"  JOB ${js.jobId} " +
          js.stageInfos.map(_.name).distinct.mkString(" | "))
      }
    })
    var last = System.nanoTime(); var lastJobs = 0
    def phase(name: String): Unit = {
      val now = System.nanoTime(); val j = jobs.get()
      println(f"PHASE $name%-28s ${(now - last) / 1e9}%6.2fs jobs=${j - lastJobs}")
      last = now; lastJobs = j
    }
    // ---- the stream_scd2 scenario, phase-instrumented; two passes so
    // the second shows WARM costs (codegen/JIT amortized)
    for (pass <- 1 to 2) {
    println(s"== PASS $pass")
    last = System.nanoTime(); lastJobs = jobs.get()
    val src = graft.TempDirs.create("psoh_src")
    val dim = graft.TempDirs.create("psoh_dim")
    val cust = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("cust_id"),
              col("c_mktsegment").as("segment"),
              col("c_acctbal").as("balance"))
    val key = Seq("cust_id"); val attrs = Seq("segment", "balance")
    val tsOf = Map(2L -> "2024-02-01 00:00:00", 3L -> "2024-03-01 00:00:00")
    phase("setup")
    graft.acid.TxLog.overwrite(cust, src)
    phase("overwrite src")
    graft.acid.Scd2.initialize(cust, dim, key, attrs, "2024-01-01 00:00:00")
    phase("scd2 init")
    val cursor = graft.streaming.ChangeFeedStream.cursor(spark, src, 2L)
    val b1 = cust
      .withColumn("segment", when(col("cust_id") % 11 === 0, lit("MIGRATED"))
        .otherwise(col("segment")))
      .withColumn("balance", when(col("cust_id") % 7 === 0, col("balance") + 100)
        .otherwise(col("balance")))
      .unionByName(cust.filter(col("cust_id") % 13 === 0)
        .select((-(col("cust_id") + 1)).as("cust_id"),
                lit("NEWSEG").as("segment"), col("balance")))
    graft.acid.TxLog.merge(b1, src, key)
    phase("merge b1 -> src")
    graft.streaming.StreamScd2.pump(spark, src, dim, key, attrs, cursor, tsOf)
    phase("pump 1")
    val b2 = cust.filter(col("cust_id") % 14 === 0)
      .select(col("cust_id"), lit("RESEG").as("segment"),
              (col("balance") + 500).as("balance"))
    graft.acid.TxLog.merge(b2, src, key)
    phase("merge b2 -> src")
    graft.streaming.StreamScd2.pump(spark, src, dim, key, attrs, cursor, tsOf)
    phase("pump 2")
    val census0 = graft.acid.TxLog.read(spark, dim).collect().toSet
    phase("census collect")
    val stale = graft.streaming.ChangeFeedStream.cursor(spark, src, 2L)
    val replay = graft.streaming.StreamScd2.pump(
      spark, src, dim, key, attrs, stale, tsOf)
    phase("replay pump")
    val replayNoop = replay.closed == 0L && replay.inserted == 0L &&
      graft.acid.TxLog.read(spark, dim).collect().toSet == census0
    phase("replay census")
    val d = graft.acid.TxLog.read(spark, dim)
      .select("cust_id", "balance", "valid_from", "valid_to", "is_current")
    val closed = d.filter(!col("is_current"))
    val linked = closed.alias("c").join(d.alias("v"),
        col("c.cust_id") === col("v.cust_id") &&
        col("c.valid_to") === col("v.valid_from"), "left_semi").count()
    val chainOk = linked == closed.count() &&
      closed.filter(col("valid_to").isNull).count() == 0
    phase("chain checks")
    val perKey = d.groupBy("cust_id")
      .agg(count(lit(1)).as("n_versions"),
           sum(when(col("is_current"), 1L).otherwise(0L)).as("n_cur"),
           sum(when(col("is_current"), col("balance"))).as("cur_bal"))
    val oneCurOk = perKey.filter(col("n_cur") =!= 1).count() == 0
    val n = perKey.groupBy("n_versions")
      .agg(count(lit(1)).as("n_keys"))
      .count()
    phase("final agg")
    println(s"chainOk=$chainOk oneCur=$oneCurOk replayNoop=$replayNoop rows=$n " +
      s"totalJobs=${jobs.get()}")
    }
    spark.stop()
  }
}
