package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness: token-Jaccard floor of the simhash
  * candidate pairs per SF dir (picks the bounded-oracle floor with
  * margin). Not part of the driver contract. */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    for (dir <- args) {
      val docs = graft.Tables.documents(spark, dir)
      val pairs = graft.dedup.Dedup.simhashCandidates(docs)
      val tokset = docs.select(col("doc_id"),
        sort_array(array_distinct(graft.text.TextOps.tokens(col("text")))).as("tk"))
      val stats = pairs
        .join(tokset.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("tk", "tk_a"), Seq("doc_a"))
        .join(tokset.withColumnRenamed("doc_id", "doc_b")
                    .withColumnRenamed("tk", "tk_b"), Seq("doc_b"))
        .select(col("hamming"),
          (size(array_intersect(col("tk_a"), col("tk_b"))).cast("double") /
            sqrt(size(col("tk_a")).cast("double") * size(col("tk_b")).cast("double")))
            .as("cos_exact"))
        .select(abs(cos(col("hamming").cast("double") * math.Pi / 64) - col("cos_exact"))
          .as("dev"), col("cos_exact"))
        .agg(count(lit(1)).as("n"), max("dev").as("max_dev"),
             expr("percentile(dev, 0.99)").as("p99_dev"),
             min("cos_exact").as("min_cos"))
        .collect()(0)
      println(s"PROBE $dir n=${stats.getLong(0)} max_dev=${stats.getDouble(1)} " +
        s"p99_dev=${stats.getDouble(2)} min_cos=${stats.getDouble(3)}")
    }
    spark.stop()
  }
}
