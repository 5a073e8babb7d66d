package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main behind the `ann_filtered` recall floors:
  * per-query recall of the filtered IVF×PQ probe against the exact
  * brute-force-over-the-filtered-subset oracle, across predicates of
  * different selectivity. Run with the testdata dir as arg. */
object ProbeFiltered {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
    for ((name, pred) <- Seq(
        ("label<3 (~0.3)", col("label") < 3),
        ("label%2=0 (~0.5)", col("label") % 2 === 0),
        ("label=7 (~0.1)", col("label") === 7))) {
      val idx = graft.similarity.IvfPq.indexFor(emb, s"probe:$dir",
        extraCols = Seq("label"))
      val brute = graft.Caching.materialize(
        graft.similarity.Cosine.bruteTopKFiltered(emb, pred, 8, 10)
          .select(col("query_id"), col("neighbor_id")))
      val got = graft.Caching.materialize(
        graft.similarity.IvfPq.probeFiltered(emb, idx, 8, 10, pred)
          .select(col("query_id"), col("neighbor_id")))
      val hits = brute.join(got, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      val recalls = brute.groupBy("query_id").agg(count(lit(1)).as("nb"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("hits"), lit(0)) / col("nb")).as("recall"))
        .collect().sortBy(_.getLong(0))
        .map(r => f"${r.getLong(0)}:${r.getDouble(1)}%.2f")
      println(s"[probe-filtered] $dir $name -> ${recalls.mkString(" ")}")
    }
    spark.stop()
  }
}
