package graft.tools

import org.apache.spark.sql.functions._

import graft.similarity.{Cosine, IvfPq}

/** Measures IVF×PQ recall vs exact brute force per SF dir across a
  * (k, nprobe, shortlist) grid — the numbers behind the `ann_ivf_pq`
  * oracle floors and the recall-vs-nprobe curve in SCALE.md. Run:
  * `runMain graft.tools.ProbeIvfPq /root/testdata/sf0.01 [k] [nprobe...]` */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ks = if (args.length > 1) Seq(args(1).toInt) else Seq(16, 256)
    val nprobes = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
                  else Seq(2, 4, 8, 16)
    val spark = graft.GraftSession.builder("probe-ivfpq", "local[32]", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    val brute = graft.Caching.materialize(
      Cosine.bruteTopK(emb, nQueries = 8, k = 10)
        .select("query_id", "neighbor_id"))
    // SPARK_GRAFT_PROBE_SHORTLIST oversizes the ADC shortlist (e.g. to
    // the corpus size) to isolate the CELL-SELECTION recall component:
    // with every row of every probed cell exact-reranked, code quality
    // is out of the loop — the measured recall is the ceiling ANY code
    // improvement (finer k, OPQ rotation) could reach at that nprobe
    val shortlist = sys.env.get("SPARK_GRAFT_PROBE_SHORTLIST")
      .map(_.toInt).getOrElse(50)
    for (k <- ks; nprobe <- nprobes) {
      val t0 = System.nanoTime()
      val ivfpq = IvfPq.topK(emb, nQueries = 8, kNeighbors = 10,
          k = k, nprobe = nprobe, shortlist = shortlist,
          indexKey = Some(s"probe:$dir:k$k"))
        .select("query_id", "neighbor_id")
      val hits = brute.join(ivfpq, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      val rec = brute.groupBy("query_id").agg(count(lit(1)).as("nb"))
        .join(hits, Seq("query_id"), "left")
        .select((coalesce(col("hits"), lit(0)) / col("nb")).as("recall"))
        .agg(min(col("recall")), avg(col("recall"))).collect()(0)
      println(f"IVFPQ $dir k=$k%3d nprobe=$nprobe%2d " +
        f"min=${rec.getDouble(0)}%.3f mean=${rec.getDouble(1)}%.3f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
