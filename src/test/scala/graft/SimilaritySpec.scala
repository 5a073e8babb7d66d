package graft

import org.apache.spark.sql.functions._

import graft.similarity.Cosine

class SimilaritySpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf)

  test("brute-force topk: k rows per query, sims descending, self excluded") {
    val t = Cosine.bruteTopK(emb, nQueries = 8, k = 10).cache()
    assert(t.groupBy("query_id").count().filter(col("count") =!= 10).count() == 0)
    assert(t.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val perQuery = t.orderBy("query_id", "rank").collect()
      .groupBy(_.getAs[Long]("query_id"))
    perQuery.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    t.unpersist()
  }

  test("lsh topk is a subset-ranking consistent with brute force") {
    val brute = Cosine.bruteTopK(emb, 8, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Cosine.lshTopK(emb, 8, 10)
    assert(lsh.count() > 0, "LSH returned no candidates at all")
    // every LSH hit's (query, neighbor) sim must equal the brute-force sim
    // when present there; and recall should be non-trivial
    val hits = Cosine.lshTopK(emb, 8, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = hits.count(brute.contains).toDouble / brute.size
    info(f"LSH recall vs brute force: $recall%.2f")
    assert(recall > 0.1, f"recall $recall too low")
  }

  test("cosine of a vector with itself is 1") {
    val p = Cosine.prepared(emb).limit(5)
    val self = p.as("a").join(p.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select((Cosine.dot(col("a.v"), col("b.v")) /
        (col("a.norm") * col("b.norm"))).as("sim"))
    assert(self.filter(abs(col("sim") - 1.0) > 1e-12).count() == 0)
  }
}
