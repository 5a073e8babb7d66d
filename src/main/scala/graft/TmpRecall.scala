package graft
import org.apache.spark.sql.functions._
import graft.similarity.Cosine
object TmpRecall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("tmp", "local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val brute = Cosine.bruteTopK(emb, 8, 10).select("query_id", "neighbor_id")
      for ((t, b) <- Seq((8, 6), (12, 6), (8, 4), (16, 8))) {
        val lsh = Cosine.lshTopK(emb, 8, 10, t, b).select("query_id", "neighbor_id")
        val rec = brute.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").count()
        val minR = brute.groupBy("query_id").count().withColumnRenamed("count", "nb")
          .join(rec, Seq("query_id"), "left")
          .select(min(coalesce(col("count"), lit(0)) / col("nb"))).collect()(0).getDouble(0)
        println(s"RECALL $sf tables=$t bits=$b min_per_query=$minR")
      }
    }
    spark.stop()
  }
}
