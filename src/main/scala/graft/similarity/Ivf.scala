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
  * Scale shape (the MLlib k-means contract): centroids are O(k×dim)
  * METADATA — they live on the driver and enter the plan as literals, so
  * cell assignment is a pure codegen projection (zero shuffle, `least`
  * over k (distance, cell) structs); the only per-iteration shuffle is
  * the map-side-combined (cell, dim) partial-mean reduce. Seeds come
  * from a distributed top-k (TakeOrdered) over xxhash64(vec_id), never a
  * global single-partition sort. A query batch probes O(corpus × nprobe
  * / k) candidates.
  *
  * Determinism: hash-seeded centroids (no RNG state) and DECIMAL(25,16)
  * means (exact, merge-order-independent) make training bit-identical
  * on every run and cluster layout.
  */
object Ivf {

  /** Assignment as a projection: argmin over k centroid literals via
    * `least` on (distance, cell) structs — codegen'd, ties break to the
    * lower cell id. Exposed to the package (round 13) so the
    * incremental index path ([[AnnIndexStore]]) can assign NEW vectors
    * under an existing index's centroids with the training pass's exact
    * rule. */
  private[similarity] def assignExpr(p: DataFrame,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val spark = p.sparkSession
    val alts = centroids.map { case (cell, c) =>
      struct((lit(1.0) - graft.functions.GraftFunctions
        .cosine_sim(spark, col("v"), typedLit(c))).as("d"), lit(cell).as("cell"))
    }
    // generic passthrough: every input column survives (provenance
    // columns like AnnIndexStore's `src_file` ride along), plus `cell`
    p.withColumn("best", least(alts: _*))
      .select(p.columns.map(col) :+ col("best.cell").as("cell"): _*)
  }

  /** Train `iters` Lloyd rounds; returns the (vec_id, v, norm, cell)
    * assignment and the centroid metadata. `extraCols` ride the ONE
    * materialized prepared frame end to end (optimization r17): the
    * returned assignment carries them via [[assignExpr]]'s generic
    * passthrough, so callers that need provenance/attribute columns no
    * longer re-scan the corpus for a second assignment pass — the extra
    * columns never enter the Lloyd aggregation, so centroids are
    * bit-identical with or without them. */
  def train(emb: DataFrame, k: Int = 16, iters: Int = 3,
            extraCols: Seq[String] = Seq.empty): (DataFrame, Seq[(Int, Seq[Double])]) =
    trainPrepared(graft.Caching.materialize(Cosine.prepared(emb, extraCols)), k, iters)

  /** [[train]] over an ALREADY prepared-and-cached frame — callers that
    * also probe ([[topK]]) reuse one materialization for seeding, every
    * Lloyd round, the final assignment, and the probe scan, instead of
    * re-materializing per call. */
  private def trainPrepared(p: DataFrame, k: Int,
                            iters: Int): (DataFrame, Seq[(Int, Seq[Double])]) = {
    require(k >= 2, "need at least two cells")
    // deterministic seeding: the k corpus vectors with smallest
    // xxhash64(vec_id) — orderBy+limit plans TakeOrderedAndProject
    // (distributed top-k), and k rows of metadata come to the driver
    var centroids: Seq[(Int, Seq[Double])] = p
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .select(col("v")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0)) }.toSeq
    var i = 0
    while (i < iters) {
      // exact DECIMAL mean per (cell, dim): merge-order-independent, so
      // centroids are run-deterministic (double partial sums are not);
      // partial-avg combines map-side, the shuffle is k×dim rows.
      // A cell that received NO vectors this round keeps its previous
      // centroid (standard empty-cluster handling) — cell ids therefore
      // stay dense 0..k-1 forever, which downstream positional indexers
      // ([[IvfPq.buildIndex]]'s `__cents[cell]` literals) rely on;
      // dropping empties would silently shift every later cell's lookup.
      val means = assignExpr(p, centroids)
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg(col("x").cast("decimal(25,16)")).cast("double").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        }
      centroids = centroids.map { case (c, old) => (c, means.getOrElse(c, old)) }
      i += 1
    }
    (assignExpr(p, centroids), centroids)
  }

  /** (vec_id, v, norm, cell) assignment after `iters` Lloyd rounds. */
  def index(emb: DataFrame, k: Int = 16, iters: Int = 3): DataFrame =
    train(emb, k, iters)._1

  /** IVF top-k: each query probes its `nprobe` nearest cells only. */
  def topK(emb: DataFrame, nQueries: Int, kNeighbors: Int,
           nCells: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    // one shared materialization: seeding, Lloyd rounds, assignment, and
    // the probe scan below all read this cached frame
    val p = graft.Caching.materialize(Cosine.prepared(emb))
    val (rawIdx, centroids) = trainPrepared(p, nCells, iters)
    val idx = graft.Caching.materialize(rawIdx)
    // probe selection is again a projection over centroid literals:
    // sort the k (distance, cell) structs, keep the first nprobe
    val alts = centroids.map { case (cell, c) =>
      struct((lit(1.0) - graft.functions.GraftFunctions
        .cosine_sim(spark, col("q_v"), typedLit(c))).as("d"), lit(cell).as("cell"))
    }
    val probes = idx.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
      .withColumn("probed", slice(array_sort(array(alts: _*)), 1, nprobe))
      .select(col("q_id"), col("q_v"), explode(col("probed.cell")).as("cell"))
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
