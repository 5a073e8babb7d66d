package graft.tools

import org.apache.spark.sql.functions._

/** Sub-step timer for the IVF×PQ retrain path (optimization r17):
  * reproduces AnnIndexStore.ivfPqIndex's retrain leg step by step on
  * the ann_rebalance corpus shape and wall-times each step (2 passes,
  * second reported — codegen/JIT warm). */
object ProbeTrain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("probe-train", "local[32]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.{AnnIndexStore, Ivf, IvfPq, Pq}
    (0 until 2).foreach { round =>
      def t[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        if (round == 1) println(f"  ${(System.nanoTime() - t0) / 1e9}%6.2fs  $name")
        r
      }
      val wh = java.nio.file.Files.createTempDirectory("ptwh").toString
      val corpus = java.nio.file.Files.createTempDirectory("ptc").toString + "/corpus"
      graft.Tables.embeddings(spark, dir).filter(col("vec_id") < 400)
        .repartition(2).write.mode("overwrite").parquet(corpus)
      val emb = spark.read.parquet(corpus)
      val withSrcDf = emb.withColumn("src_file",
        substring_index(col("_metadata.file_path"), "/", -1))
      val (assigned, centroids) = t("ivf train") {
        Ivf.train(withSrcDf, 16, 3, Seq("src_file")) }
      val cents = centroids.map(_._2)
      val resid = t("resid materialize(lazy)") { graft.Caching.materialize(
        IvfPq.residualFrame(assigned, cents, Seq("src_file"))) }
      val cb = t("pq train") { Pq.train(resid, 16, 64, 3) }
      val codeFrame = t("codeRows(lazy)") {
        IvfPq.codeRows(resid, cb, cents, Seq("src_file")) }
      val dist = t("dist sample") {
        AnnIndexStore.meanDistortionProbe(spark, resid, cb) }
      val loc = new java.io.File(wh, "emb_rb").toString
      t("txlog overwrite") {
        graft.acid.TxLog.overwrite(codeFrame, loc, Seq("cell"),
          overwriteSchema = true) }
      t("tag append") {
        graft.acid.TxLog.append(
          graft.acid.TxLog.read(spark, loc).limit(0), loc,
          commitTag = Some("probe=1")) }
      // old r16 path for comparison: scratch write + re-read + overwrite
      val scratch = java.nio.file.Files.createTempDirectory("pts").toString + "/codes"
      t("old: scratch write") {
        codeFrame.write.partitionBy("cell").mode("overwrite").parquet(scratch) }
      val loc2 = new java.io.File(wh, "emb_rb2").toString
      t("old: overwrite from re-read") {
        graft.acid.TxLog.overwrite(spark.read.parquet(scratch), loc2,
          Seq("cell"), overwriteSchema = true) }
      // isolate the rebalance hint on the literal-heavy frame
      val s2 = java.nio.file.Files.createTempDirectory("pts2").toString + "/c"
      t("codeFrame rebalance write") {
        codeFrame.hint("rebalance", col("cell"))
          .write.partitionBy("cell").mode("overwrite").parquet(s2) }
      val s3 = java.nio.file.Files.createTempDirectory("pts3").toString + "/c"
      t("codeFrame plain write") {
        codeFrame.write.partitionBy("cell").mode("overwrite").parquet(s3) }
      if (round == 1) println(s"  dist=$dist")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
