package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.etl.Splits

class ClustersSpec extends SparkSpec {

  test("connected components: labels are component minima and closed under edges") {
    import spark.implicits._
    // two chains and a triangle: {1-2-3-4}, {10-11}, {20-21-22 triangle}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("cluster assembly over text near-dups is edge-consistent") {
    val cc = SparkEntry.dedupClusters(spark, sf).cache()
    val pairs = graft.dedup.Dedup
      .ngramJaccard(Tables.documents(spark, sf)).select("doc_a", "doc_b")
    // both endpoints of every edge share a cluster
    val a = cc.select(col("node").as("doc_a"), col("cluster").as("ca"))
    val b = cc.select(col("node").as("doc_b"), col("cluster").as("cb"))
    val violated = pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .filter(col("ca") =!= col("cb")).count()
    assert(violated == 0)
    cc.unpersist()
  }

  test("composed pipeline: exact drops before banding, near drops from verified clusters") {
    import spark.implicits._
    // synthetic corpus exercising BOTH stages: 0/1 exact copies, 2 a
    // shuffled near-dup of 0, 3 unrelated
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "beta gamma delta epsilon zeta eta theta alpha"),
      (3L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup.pipeline(docs, minJaccard = 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // 1 drops as exact copy of 0; 2 drops as near-dup of keeper 0
    // (6 of 8 rotated 3-grams shared => jaccard 6/10); 3 survives
    assert(out == Set((1L, 0L, "exact"), (2L, 0L, "near")))
  }

  test("hash split is disjoint, exhaustive, and deterministic") {
    val docs = Tables.documents(spark, sf)
    val (train, test) = Splits.hashSplit(docs, "doc_id", 100)
    assert(train.count() + test.count() == docs.count())
    assert(train.join(test, Seq("doc_id"), "inner").count() == 0)
    val again = Splits.hashSplit(docs, "doc_id", 100)._2
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val first = test.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(first == again)
    assert(test.count() > 0)
  }
}
