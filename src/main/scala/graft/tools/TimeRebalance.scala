package graft.tools

import org.apache.spark.sql.functions._

/** Phase timer for the ann_rebalance scenario: same steps as
  * SparkEntry.annRebalance, each phase wall-timed (2 passes, second
  * reported — codegen/JIT warm). */
object TimeRebalance {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("time-rebalance", "local[32]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.{AnnIndexStore, Cosine, IvfPq}
    (0 until 2).foreach { round =>
      def t[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        if (round == 1) println(f"  ${(System.nanoTime() - t0) / 1e9}%6.2fs  $name")
        r
      }
      val wh = java.nio.file.Files.createTempDirectory("rbwh").toString
      val corpus = java.nio.file.Files.createTempDirectory("rbc").toString + "/corpus"
      val emb0 = graft.Tables.embeddings(spark, dir)
      t("stage corpus") {
        emb0.filter(col("vec_id") < 400).repartition(2)
          .write.mode("overwrite").parquet(corpus)
      }
      t("train") { AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus), wh,
        "emb_rb", nCells = 16, m = 16, k = 64) }
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
      t("append skew") {
        skewRows.toDF("vec_id", "embedding")
          .coalesce(1).write.mode("append").parquet(corpus)
      }
      t("extend") { AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus), wh,
        "emb_rb", nCells = 16, m = 16, k = 64) }
      t("cellHealth+count") {
        AnnIndexStore.cellHealth(spark, wh, "emb_rb").get
        val loc = graft.acid.GraftCatalog.find(wh, "emb_rb").get.location
        graft.acid.TxLog.read(spark, loc).filter(col("cell") === 0).count()
      }
      t("rebalanceCells") { AnnIndexStore.rebalanceCells(spark, wh, "emb_rb") }
      val (idx2, _) = t("reload") { AnnIndexStore.ivfPqIndex(
        spark.read.parquet(corpus), wh, "emb_rb", nCells = 16, m = 16, k = 64) }
      val emb2 = t("cache corpus") { graft.Caching.materialize(spark.read.parquet(corpus)) }
      val brute = t("brute") { graft.Caching.materialize(
        Cosine.bruteTopK(emb2, nQueries = 8, k = 10)
          .select(col("query_id"), col("neighbor_id"))) }
      val got = t("probe") { graft.Caching.materialize(
        IvfPq.probe(emb2, idx2, nQueries = 8, kNeighbors = 10,
            nprobe = 20, shortlist = 200)
          .select(col("query_id"), col("neighbor_id"))) }
      t("recall collect") {
        val hits = brute.join(got, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
        brute.groupBy("query_id").agg(count(lit(1)).as("nb"))
          .join(hits, Seq("query_id"), "left")
          .filter(col("query_id") >= 1)
          .select((coalesce(col("hits"), lit(0)) / col("nb")).as("recall"))
          .collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
