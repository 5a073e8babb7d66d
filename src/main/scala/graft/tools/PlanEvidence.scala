package graft.tools

import org.apache.spark.sql.functions._

import graft.similarity.{Ivf, IvfPq, Pq}

/** Prints the physical-plan evidence PLANS.md cites for the round-9/11
  * ANN and encode paths: the IVF×PQ probe's partition-pruned code-table
  * scan, the ADC lookup projection, and the native pq_encode projection.
  * Run: `runMain graft.tools.PlanEvidence /root/testdata/sf0.01` */
object PlanEvidence {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("plan-evidence", "local[8]", 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)

    println("========== ivfpq probe (partition-pruned ADC scan) ==========")
    IvfPq.topK(emb, nQueries = 2, kNeighbors = 5,
      indexKey = Some(s"evidence:$dir")).explain("formatted")

    println("========== pq_encode projection (native codegen) ==========")
    val cb = Pq.train(emb, 16, 16, iters = 1)
    Pq.encode(emb, cb).explain("formatted")

    println("========== ivf cell assignment (driver-literal argmin) ==========")
    Ivf.index(emb, 4, 1).explain()

    spark.stop()
  }
}
