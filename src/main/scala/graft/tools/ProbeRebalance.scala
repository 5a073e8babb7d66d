package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Diagnostic for the ann_rebalance recall floor at a given SF: rebuilds
  * the scenario's corpus + rebalanced index and prints per-query recall
  * of the probe against brute force, plus where the misses live
  * (which cell holds each missed true neighbor, and whether the probe's
  * nprobe cell list contains it).
  */
object ProbeRebalance {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("probe-rebalance", "local[32]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.{AnnIndexStore, Cosine, IvfPq}
    val wh = java.nio.file.Files.createTempDirectory("rbwh").toString
    val corpus = java.nio.file.Files.createTempDirectory("rbcorp").toString + "/corpus"
    val emb0 = graft.Tables.embeddings(spark, dir)
    emb0.filter(col("vec_id") < 400).repartition(2)
      .write.mode("overwrite").parquet(corpus)
    AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus), wh, "emb_rb",
      nCells = 16, m = 16, k = 64)
    val v0 = emb0.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val nrm = math.sqrt(v0.map(x => x.toDouble * x).sum).toFloat
    val skewRows = (0 until 400).map { i =>
      val g = i % 4
      val v = v0.toArray.clone()
      v(g * 4) += 0.5f * nrm
      v(32 + g) += 0.02f * nrm * ((i / 4 % 7) - 3) / 3f
      (100000L + i, v.toSeq)
    }
    import spark.implicits._
    skewRows.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(corpus)
    AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus), wh, "emb_rb",
      nCells = 16, m = 16, k = 64)
    AnnIndexStore.rebalanceCells(spark, wh, "emb_rb")
    val (idx2, _) = AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus), wh,
      "emb_rb", nCells = 16, m = 16, k = 64)
    val nprobeArg = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val emb2 = spark.read.parquet(corpus).cache()
    val brute = Cosine.bruteTopK(emb2, nQueries = 8, k = 10)
      .select(col("query_id"), col("neighbor_id")).cache()
    val slArg = args.drop(2).headOption.map(_.toInt).getOrElse(50)
    val got = IvfPq.probe(emb2, idx2, nQueries = 8, kNeighbors = 10,
        nprobe = nprobeArg, shortlist = slArg)
      .select(col("query_id"), col("neighbor_id")).cache()
    val recalls = brute.alias("b")
      .join(got.alias("g"), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    brute.groupBy("query_id").agg(count(lit(1)).as("nb"))
      .join(recalls, Seq("query_id"), "left")
      .orderBy("query_id").collect()
      .foreach(r => println(s"query ${r.getLong(0)}: recall ${
        Option(r.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L)}/${r.getLong(1)}"))
    // where do the misses live? cell of each missed true neighbor
    val codes = graft.acid.TxLog.read(spark,
      graft.acid.GraftCatalog.find(wh, "emb_rb").get.location)
    val missed = brute.exceptAll(got.select(col("query_id"), col("neighbor_id")))
    missed.alias("m").join(codes.alias("c"),
        col("m.neighbor_id") === col("c.vec_id"))
      .select(col("m.query_id"), col("m.neighbor_id"), col("c.cell"))
      .orderBy("query_id", "neighbor_id")
      .collect().foreach(r => println(s"  missed q=${r.getLong(0)} nb=${r.getLong(1)} cell=${r.getInt(2)}"))
    println("census: " + codes.groupBy("cell").count().orderBy("cell")
      .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    spark.stop()
  }
}
