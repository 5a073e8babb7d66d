package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set over the corpus: ONE corpus scan, no shuffle of the big side; the
  * per-query top-k is a rank window over query_id (k × |queries| rows).
  *
  * Scale path: random-hyperplane LSH — each vector maps to L bucket ids
  * (sign-bit signatures against fixed hyperplanes); queries probe only
  * their buckets, so the join touches O(|corpus| / 2^bits × L) candidates
  * per query instead of the full corpus.
  *
  * Numerics: embedding floats are widened to double once; the pair-level
  * dot product is expanded to a fixed-width arithmetic expression (stays
  * inside whole-stage codegen — array higher-order lambdas are
  * interpreted per element, ~100× slower over millions of pairs) with
  * strict left-to-right accumulation, matching a sequential-loop engine
  * bit-for-bit.
  */
object Cosine {

  val Dim = 64

  /** (vec_id, v: array<double>, norm). Norm via HOF is fine: O(corpus)
    * rows, not O(pairs). */
  def prepared(emb: DataFrame): DataFrame =
    emb
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(v, cast(0 as double), (acc, x) -> acc + x * x))"))
      .select("vec_id", "v", "norm")

  /** Codegen-friendly dot product: sum of Dim element products, strict
    * left-to-right. */
  def dot(a: Column, b: Column, dim: Int = Dim): Column =
    (0 until dim).map(i => a(i) * b(i)).reduce(_ + _)

  /** All pairs (a < b) above a similarity threshold — embedding near-dup.
    * O(n²) pair generation with one side broadcast; at corpus scale the
    * LSH bucketing below bounds the candidate set first (same verify
    * math). */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    // All-pairs cosine is a pure flops kernel; the declarative encodings
    // (BNLJ with the dot in the join condition, or id-pairs + two hash
    // joins re-attaching 512-byte arrays) spend their time in interpreted
    // condition eval or UnsafeRow array copies. This is the documented
    // tier-(d) mapPartitions case: stream the corpus partition-wise
    // against a broadcast of itself — O(n²/partitions) work per task, no
    // shuffle, primitive double[] inner loop (JIT-vectorized). The
    // accumulation order (ascending index) matches the sequential-loop
    // semantics the DuckDB oracle uses, so results are bit-identical.
    // At corpus scale the broadcast side must fit in executor memory —
    // beyond that, `lshTopK`-style bucketing is the supported path.
    val spark = emb.sparkSession
    import spark.implicits._
    val p = prepared(emb)
      .select(col("vec_id"), col("v"), col("norm"))
      .as[(Long, Array[Double], Double)]
    val corpus = p.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    val pairs = p.mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (ida, va, na) =>
        cs.iterator.filter(_._1 > ida).flatMap { case (idb, vb, nb) =>
          var s = 0.0
          var i = 0
          while (i < va.length) { s += va(i) * vb(i); i += 1 }
          val sim = s / (na * nb)
          if (sim >= threshold) Iterator.single((ida, idb, sim)) else Iterator.empty
        }
      }
    }.toDF("vec_a", "vec_b", "sim_raw")
    pairs
      .select(col("vec_a"), col("vec_b"), round(col("sim_raw"), 4).as("sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Brute-force cosine top-k for the query set `vec_id < nQueries`
    * (self excluded). Cosine via the native codegen expression
    * [[graft.functions.CosineSim]] — one corpus scan, no shuffle of the
    * big side. */
  def bruteTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    val p = prepared(emb)
    val q = p.filter(col("vec_id") < nQueries)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rawsim").desc, col("neighbor_id"))
    p.as("c").join(broadcast(q.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
              graft.functions.GraftFunctions
                .cosine_sim(spark, col("q.v"), col("c.v")).as("rawsim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("rawsim"), 4).as("sim"))
      .orderBy("query_id", "rank")
  }

  // ------------------------------------------------------------- LSH ANN

  /** Sign-bit bucket ids per table via the native
    * [[graft.functions.HyperplaneSig]] expression (deterministic
    * LCG-derived ±1 hyperplanes), exploded to
    * (vec_id, v, norm, table_id, bucket). */
  private def bucketed(p: DataFrame, tables: Int, bits: Int, dim: Int): DataFrame =
    p.select(col("vec_id"), col("v"), col("norm"),
      posexplode(graft.functions.HyperplaneSigFunction
        .hyperplane_sig(p.sparkSession, col("v"), tables, bits))
        .as(Seq("table_id", "bucket")))

  /** LSH-bucketed ANN: queries probe only their (table, bucket) cells;
    * candidates deduped then ranked by exact cosine. Recall < 1 by
    * design; tables × bits trade recall vs candidate volume. */
  def lshTopK(emb: DataFrame, nQueries: Int, k: Int,
              tables: Int = 4, bits: Int = 6): DataFrame = {
    val p = prepared(emb)
    // cached: probed twice (query side + corpus side of the bucket join)
    val corpusBuckets = bucketed(p, tables, bits, Dim).cache()
    val queryBuckets = corpusBuckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"),
              col("norm").as("q_norm"), col("table_id"), col("bucket"))
    val candidates = corpusBuckets
      .join(broadcast(queryBuckets), Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
              col("q_v"), col("q_norm"), col("v"), col("norm"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rawsim").desc, col("neighbor_id"))
    candidates
      .withColumn("rawsim",
        graft.functions.GraftFunctions.cosine_sim(emb.sparkSession, col("q_v"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("rawsim"), 4).as("sim"))
      .orderBy("query_id", "rank")
  }
}
