package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.{Cosine, Pq}

/** Decomposes `ann_pq`'s cost at a given SF: training, encoding,
  * reconstruction, the shortlist join, the full PQ top-k, the exact
  * brute-force reference, and the whole registry frame (which evaluates
  * brute 3x and pq 2x for the recall oracle). Usage: runMain with
  * SPARK_GRAFT_SF_DIR set. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    println(s"n_vectors=${emb.count()}")

    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      time(tag)(df.write.format("noop").mode("overwrite").save())

    val cb = time("train")(Pq.train(emb))
    noop("encode-only")(Pq.encode(emb, cb))
    noop("brute-topk")(Cosine.bruteTopK(emb, nQueries = 8, k = 10))
    noop("pq-topk")(Pq.topK(emb, nQueries = 8, kNeighbors = 10))
    noop("registry-frame")(graft.SparkEntry.annPq(spark, sfDir))
    spark.stop()
  }
}
