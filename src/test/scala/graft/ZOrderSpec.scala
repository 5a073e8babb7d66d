package graft

import org.apache.spark.sql.functions._

import graft.acid.TxLog

class ZOrderSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_z").toString

  // a = sequential, b = decorrelated from a (multiplicative-hash shuffle)
  private def data = spark.range(4096).select(
    col("id").as("a"),
    (col("id") * 2654435761L % 4096).as("b"),
    (col("id") % 97).cast("double").as("v"))

  private def probe(t: String, cond: org.apache.spark.sql.Column): (Int, Int, Long) = {
    val (table, idx) = TxLog.readWithSkipInfo(spark, t)
    val n = table.filter(cond).count()
    val (sel, tot) = idx.lastListing.get
    (sel, tot, n)
  }

  test("single-column cluster skips only its own column; zorder skips both") {
    val t1 = tmp()
    TxLog.overwrite(data.repartition(8), t1)
    TxLog.optimize(spark, t1, clusterBy = Seq("a"), nFiles = 16)
    val (selA1, totA1, nA1) = probe(t1, col("a") >= 0 && col("a") < 256)
    val (selB1, totB1, nB1) = probe(t1, col("b") >= 0 && col("b") < 256)
    assert(selA1 < totA1, "cluster by a must skip on a")
    assert(selB1 == totB1, "cluster by a cannot skip on decorrelated b")

    val t2 = tmp()
    TxLog.overwrite(data.repartition(8), t2)
    TxLog.optimize(spark, t2, zorderBy = Seq("a", "b"), nFiles = 16)
    val (selA2, totA2, nA2) = probe(t2, col("a") >= 0 && col("a") < 256)
    val (selB2, totB2, nB2) = probe(t2, col("b") >= 0 && col("b") < 256)
    assert(selA2 < totA2, s"zorder must skip on a ($selA2/$totA2)")
    assert(selB2 < totB2, s"zorder must skip on b ($selB2/$totB2)")
    // identical answers under every layout
    assert(nA1 == nA2 && nB1 == nB2 && nA1 == 256L && nB1 == 256L)
  }

  test("zorder rewrite preserves content exactly and stays one commit") {
    val t = tmp()
    TxLog.overwrite(data.repartition(8), t)
    val before = data.collect().map(_.toSeq).toSet
    TxLog.optimize(spark, t, zorderBy = Seq("a", "b"), nFiles = 8)
    assert(TxLog.read(spark, t).collect().map(_.toSeq).toSet == before)
    assert(TxLog.currentVersion(spark, t) == 2L)
    // time travel still sees the pre-optimize layout's content
    assert(TxLog.read(spark, t, Some(1L)).count() == 4096L)
  }

  test("zorder on a partitioned table keeps partition pruning the outer level") {
    val t = tmp()
    val part = data.withColumn("p", (col("a") % 2).cast("string"))
    TxLog.overwrite(part, t, Seq("p"))
    TxLog.optimize(spark, t, zorderBy = Seq("a", "b"))
    assert(TxLog.read(spark, t).filter(col("p") === "1").count() == 2048L)
    assert(TxLog.read(spark, t).count() == 4096L)
  }
}
