package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: partition the corpus into Voronoi cells
  * around k-means centroids; a query probes only the `nprobe` nearest
  * cells. The other classic scale path besides hyperplane LSH
  * ([[Cosine.lshTopK]]): cells adapt to the data distribution, so probe
  * quality degrades more gracefully on clustered corpora.
  *
  * Scale shape: training touches the corpus `iters` times with one
  * small shuffle per iteration (n×dim partial sums → k×dim); the index
  * is one (vec_id → cell) column; a query batch joins against only its
  * probed cells — O(|corpus| × nprobe / k) candidates per query.
  *
  * Determinism: centroid seeds are the vectors with the k smallest
  * xxhash64(vec_id) (no RNG state), and centroid means are averaged in
  * DECIMAL(25,16) — exact, merge-order-independent — so training gives
  * bit-identical centroids on every run and cluster layout.
  */
object Ivf {

  /** ((vec_id, v, norm, cell) assignment, (cell, c) centroids) after
    * `iters` Lloyd rounds. */
  def train(emb: DataFrame, k: Int = 16, iters: Int = 3): (DataFrame, DataFrame) = {
    val p = graft.Caching.materialize(Cosine.prepared(emb))
    // deterministic seeding: the k corpus vectors with smallest
    // xxhash64(vec_id), cell ids from that total order (no RNG state)
    var centroids = p
      .withColumn("h", xxhash64(col("vec_id")))
      .withColumn("rn", row_number().over(Window.orderBy(col("h"), col("vec_id"))))
      .filter(col("rn") <= k)
      .select((col("rn") - 1).cast("int").as("cell"), col("v").as("c"))

    var i = 0
    while (i < iters) {
      // exact DECIMAL mean per (cell, dim): merge-order-independent, so
      // centroids are run-deterministic (double partial sums are not)
      centroids = assign(p, centroids)
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg(col("x").cast("decimal(25,16)")).cast("double").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, e -> e.m)").as("c"))
      i += 1
    }
    (assign(p, centroids), centroids)
  }

  /** (vec_id, v, norm, cell) assignment after `iters` Lloyd rounds. */
  def index(emb: DataFrame, k: Int = 16, iters: Int = 3): DataFrame =
    train(emb, k, iters)._1

  /** Nearest-centroid assignment: centroids are tiny → broadcast; argmin
    * via min(struct(dist, cell)) keeps it one aggregation, no window. */
  private def assign(p: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = p.sparkSession
    val dist = lit(1.0) - graft.functions.GraftFunctions
      .cosine_sim(spark, col("v"), col("c"))
    p.join(broadcast(centroids))
      .groupBy("vec_id")
      .agg(min(struct(dist.as("d"), col("cell"))).as("best"),
           first(col("v")).as("v"), first(col("norm")).as("norm"))
      .select(col("vec_id"), col("v"), col("norm"), col("best.cell").as("cell"))
  }

  /** IVF top-k: each query probes its `nprobe` nearest cells only. */
  def topK(emb: DataFrame, nQueries: Int, kNeighbors: Int,
           nCells: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    val (rawIdx, centroids) = train(emb, nCells, iters)
    val idx = graft.Caching.materialize(rawIdx)
    val queries = idx.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    // per query: nprobe nearest cells
    val probeW = Window.partitionBy("q_id")
      .orderBy(col("cdist"), col("cell"))
    val probes = queries.join(broadcast(centroids))
      .withColumn("cdist", lit(1.0) - graft.functions.GraftFunctions
        .cosine_sim(spark, col("q_v"), col("c")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_v"), col("cell"))
    // search only the probed cells
    val w = Window.partitionBy("query_id")
      .orderBy(col("rawsim").desc, col("neighbor_id"))
    idx.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.GraftFunctions.cosine_sim(spark, col("q_v"), col("v"))
          .as("rawsim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeighbors)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("rawsim"), 4).as("sim"))
      .orderBy("query_id", "rank")
  }
}
