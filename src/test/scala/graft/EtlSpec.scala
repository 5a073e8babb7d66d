package graft

import org.apache.spark.sql.functions._

import graft.etl._

class EtlSpec extends SparkSpec {

  test("consumer pipeline unifies fleets, applies DQ, adds features") {
    val c = ConsumerPipeline.consumer(spark, sf).cache()
    assert(c.count() > 0)
    // only the two mapped fleets survive
    val types = c.select("trip_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set(ConsumerPipeline.YellowType, ConsumerPipeline.GreenType))
    // DQ: no nulls / non-positives
    assert(c.filter(col("passenger_count") <= 0 || col("total_amount") < 0 ||
      col("pickup_datetime").isNull).count() == 0)
    // features present and sane
    assert(c.filter(col("trip_year") =!= 2024 || col("trip_month") =!= 1).count() == 0)
    c.unpersist()
  }

  test("schema unification coalesces divergent timestamp columns") {
    val u = ConsumerPipeline.unified(spark, sf)
    assert(u.filter(col("pickup_datetime").isNull).count() == 0)
    // yellow rows carry tpep, green rows carry lpep — never both
    assert(u.filter(col("tpep_pickup_datetime").isNotNull &&
      col("lpep_pickup_datetime").isNotNull).count() == 0)
  }

  test("DQ audit counts violations in one pass") {
    val ev = Tables.events(spark, sf)
    val rules = Seq(DqRule.Positive("user_id"), DqRule.NonNegative("value"))
    val row = DataQuality.audit(ev, rules).collect()(0)
    val total = row.getAs[Long]("rows_total")
    assert(total == ev.count())
    val cleanCount = DataQuality.clean(ev, rules).count()
    // violations of rule 0 (user_id <= 0) must equal total - |user_id>0|
    assert(row.getAs[Long]("viol_0") == total - ev.filter(col("user_id") > 0).count())
    assert(cleanCount <= total)
  }

  test("overwritePartitions replaces partitions whose reprocessed slice is empty") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_owp").toString
    val parts = Seq("trip_type", "trip_month")
    val v0 = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0))
      .toDF("trip_type", "trip_month", "amount")
      .select("amount", "trip_type", "trip_month")
    PartitionedSink.write(v0, path, parts)
    // reprocess fleet "a" with a rule that EMPTIES partition (a, 2)
    val aSlice = v0.filter(col("trip_type") === "a")
    PartitionedSink.overwritePartitions(
      aSlice.filter(col("amount") < 15), aSlice, path, parts)
    val back = PartitionedSink.read(spark, path)
      .select(col("trip_type"), col("trip_month").cast("int"), col("amount"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    // (a,2) gone — not stale; (b,1) untouched; (a,1) reprocessed
    assert(back == Set(("a", 1, 10.0), ("b", 1, 30.0)))
  }

  test("all registered queries return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("bucketed tables survive tempdir cleanup and recover from a deleted location") {
    SparkEntry.ensureBucketedTables(spark, sf)
    // session-lifetime tables must NOT be in the reclamation registry:
    // a later scenario's cleanup would delete their data out from under
    // the catalog entry
    SparkEntry.cleanupTempDirs()
    assert(spark.table("graft_lineitem_b").count() > 0,
      "per-scenario cleanup deleted the bucketed tables' data")
    // if the location IS lost while the name stays registered, the guard
    // rebuilds instead of serving a dangling path
    val loc = java.net.URI.create(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_lineitem_b"))
        .location.toString).getPath
    val root = java.nio.file.Paths.get(loc).getParent // base holding both tables
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverseIterator
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    SparkEntry.ensureBucketedTables(spark, sf)
    assert(spark.table("graft_lineitem_b").count() > 0)
    assert(spark.table("graft_orders_b").count() > 0)
  }

  test("resilient ingest quarantines the corrupt path and lands the rest") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_resil").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .write.parquet(s"$base/p1")
    Seq((3L, "z")).toDF("id", "v")
      .write.parquet(s"$base/p2")
    // p3 is a landing dir whose file is not parquet at all
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/p3"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/p3/part-00000.parquet"),
      "garbage bytes, not parquet".getBytes("UTF-8"))
    val (good, quarantined) = Ingest.readBatchResilient(spark,
      Seq(s"$base/p1", s"$base/p2", s"$base/p3"))
    assert(good.count() == 3, "both healthy paths land")
    assert(quarantined.map(_.path) == Seq(s"$base/p3"))
    assert(quarantined.head.reason.nonEmpty, "quarantine carries the decode error")
    // an all-bad batch still returns a frame plus the full quarantine list
    val (empty, allBad) = Ingest.readBatchResilient(spark, Seq(s"$base/p3"))
    assert(empty.count() == 0 && allBad.size == 1)
    // a MIXED path (one healthy + one corrupt file) must quarantine, not
    // pass single-footer validation and then fail the combined read
    Seq((9L, "w")).toDF("id", "v").write.parquet(s"$base/p4")
    val firstParquet = new java.io.File(s"$base/p4").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/p4/part-99999-corrupt.snappy.parquet"),
      "garbage next to a healthy file".getBytes("UTF-8"))
    assert(firstParquet.exists)
    val (good2, quarantined2) = Ingest.readBatchResilient(spark,
      Seq(s"$base/p1", s"$base/p4"))
    assert(quarantined2.map(_.path) == Seq(s"$base/p4"))
    assert(good2.count() == 2, "healthy path still lands")
  }

  test("mixture sampling: deterministic, target-capped, prefix-maximal, binding-domain scale") {
    import graft.etl.Mixture
    val docs = Tables.documents(spark, sf)
    val weightOf = (src: org.apache.spark.sql.Column) =>
      lit(1L) + regexp_extract(src, "([0-9]+)", 1).cast("long") % 3L
    val kept = Mixture.sampleByTokenShare(docs, "source", weightOf, Mixture.lcgOrder)
      .select("doc_id", "source", "__tk", "__w", "__target", "__cum").cache()

    // per-source: kept tokens never exceed the target, and the sample is
    // prefix-maximal — every non-kept doc's cumulative sum overflows
    val over = kept.groupBy("source")
      .agg(sum("__tk").as("kt"), first("__target").as("tg"))
      .filter(col("kt") > col("tg")).count()
    assert(over == 0, "a domain exceeded its token target")
    val all = Mixture.sampleByTokenShare(docs, "source", weightOf, Mixture.lcgOrder)
    // (recompute with the same bookkeeping, no filter bypass: any row
    // with cum <= target must be in kept, i.e. counts match exactly)
    assert(all.count() == kept.count())

    // binding-domain law: target_s = w_s * min_s floor(inv_s / w_s)
    val inv = docs.withColumn("tk", size(split(col("text"), " ")).cast("long"))
      .withColumn("w", weightOf(col("source")))
      .groupBy("source").agg(first("w").as("w"), sum("tk").as("inv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val scale = inv.values.map { case (w, i) => i / w }.min
    kept.select("source", "__w", "__target").distinct().collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * scale,
        s"${r.getString(0)}: target ${r.getLong(2)} != w*scale ${r.getLong(1) * scale}")
    }

    // deterministic under physical layout: same membership fingerprint
    // after an arbitrary repartition
    val a = Mixture.mixtureReport(docs, "source", weightOf, Mixture.lcgOrder).collect()
    val b = Mixture.mixtureReport(docs.repartition(7), "source", weightOf,
      Mixture.lcgOrder).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    kept.unpersist()
  }

  test("resilient ingest validates a wide fan-out in one distributed job") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_resil_wide").toString
    val n = 40
    (0 until n).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.parquet(s"$base/p$i")
    }
    // one corrupt partition in the middle, one missing path at the end
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/p7/part-corrupt.snappy.parquet"),
      "not parquet".getBytes("UTF-8"))
    val paths = (0 until n).map(i => s"$base/p$i") :+ s"$base/p_missing"
    // validation must be ONE spark job over the path list, not one
    // driver round-trip per path — count jobs via a listener
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (good, bad) = Ingest.readBatchResilient(spark, paths)
      assert(bad.map(_.path).toSet == Set(s"$base/p7", s"$base/p_missing"))
      assert(good.count() == (n - 1).toLong, "all healthy partitions land")
      // listener events are async — poll briefly for the final job-start
      val deadline = System.nanoTime() + 5e9.toLong
      while (jobs.get() < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      // the count() above and merge-schema inference add a handful of
      // jobs of their own; the bound proves validation didn't run
      // O(paths) = 41 jobs
      assert(jobs.get() <= 8, s"expected O(1) jobs for validation, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
