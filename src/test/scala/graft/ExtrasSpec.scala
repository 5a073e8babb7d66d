package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Salting
import graft.functions.GraftFunctions
import graft.reporting.Reports
import graft.streaming.EventsStream

class ExtrasSpec extends SparkSpec {

  test("native cosine_sim expression matches the HOF formulation") {
    import graft.similarity.Cosine
    val p = Cosine.prepared(Tables.embeddings(spark, sf)).limit(50)
    val pairs = p.as("a").crossJoin(p.as("b")).limit(500)
    val viaExpr = pairs.select(
      GraftFunctions.cosine_sim(spark, col("a.v"), col("b.v")).as("s1"),
      (Cosine.dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("s2"))
    assert(viaExpr.filter(abs(col("s1") - col("s2")) > 1e-12).count() == 0)
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf).withColumnRenamed("l_suppkey", "s_suppkey")
    val sup = Tables.supplier(spark, sf)
    val salted = Salting.saltedEquiJoin(li, sup, Seq("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n")).orderBy("s_name").collect()
    val plain = li.join(sup, Seq("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n")).orderBy("s_name").collect()
    assert(salted.sameElements(plain))
  }

  test("empty report writes a readable schema-stable parquet") {
    val schema = StructType(Seq(
      StructField("report_month", StringType), StructField("avg_total_amount", DoubleType)))
    val path = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Reports.emptyReport(spark, schema, path)
    val back = spark.read.parquet(path)
    assert(back.count() == 0)
    assert(back.schema == schema)
  }

  test("stateful streaming sessionization emits ALL sessions via event-time timeout") {
    val emitted = EventsStream.runSessionizeStream(spark, Tables.events(spark, sf))
    // batch sessionization is the ground truth: with EventTimeTimeout the
    // stream emits every session, including each user's final one (the
    // NoTimeout shape parked it in state forever)
    val batch = graft.analytics.Queries.windowSessionize(spark, sf)
    assert(emitted.count() == batch.count())
    assert(emitted.filter(col("session_start") > col("session_end")).count() == 0)
    // state for every real user was removed on timeout — the re-keyed
    // session set matches batch exactly, so nothing was double-emitted
    assert(emitted.select("user_id", "session_start").distinct().count() ==
      emitted.count())
  }

  test("incremental overwrite keeps untouched partitions") {
    val r = SparkEntry.etlIncremental(spark, sf).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val consumer = graft.etl.ConsumerPipeline.consumer(spark, sf)
    assert(r("view") == consumer.filter(col("trip_type") === "view").count())
    assert(r("purchase") == consumer
      .filter(col("trip_type") === "purchase" && col("total_amount") >= 100).count())
  }
}
