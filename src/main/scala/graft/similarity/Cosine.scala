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

  /** (vec_id, v: array<double>, norm [, extraCols…]). Norm via HOF is
    * fine: O(corpus) rows, not O(pairs). `extraCols` pass through
    * untouched (the index stores thread per-row provenance this way —
    * see [[AnnIndexStore]]'s `src_file`). */
  def prepared(emb: DataFrame, extraCols: Seq[String] = Seq.empty): DataFrame =
    emb
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(v, cast(0 as double), (acc, x) -> acc + x * x))"))
      .select(("vec_id" +: "v" +: "norm" +: extraCols).map(col): _*)

  /** Codegen-friendly dot product: sum of Dim element products, strict
    * left-to-right. */
  def dot(a: Column, b: Column, dim: Int = Dim): Column =
    (0 until dim).map(i => a(i) * b(i)).reduce(_ + _)

  /** All pairs (a < b) above a similarity threshold — embedding near-dup.
    *
    * Exact threshold-join = inherently O(n²) flops (the oracle's
    * cross-join is too); what must NOT be O(n) is driver or single-task
    * memory. Block-partitioned all-pairs: hash every vector into one of B
    * blocks, enumerate the B(B+1)/2 unordered block pairs (a tiny
    * driver-side relation), replicate each block to the block-pairs it
    * participates in (shuffle volume O(n·B), the standard distributed
    * all-pairs trade), and sort-merge join on the (blk_i, blk_j) key — the
    * per-key cross product IS the pair enumeration, with the codegen
    * [[graft.functions.CosineSim]] filter applied pair-by-pair inside the
    * join, so nothing wider than a (id, id, sim) row survives. Executor
    * memory is bounded by `maxBlockRows` (the SMJ buffers one block's
    * rows per key), driver memory by B². Zero collect, zero broadcast of
    * the corpus.
    *
    * Why not LSH candidates here: measured on this corpus, qualifying
    * pairs sit exactly at the threshold (min sim 0.4005 at sf0.01), where
    * a random hyperplane agrees with probability 1−θ/π ≈ 0.63 per bit —
    * recall 1.0 would need ~54 tables at 4 bits, i.e. MORE candidate
    * pairs than all-pairs. LSH (recall < 1 by design) is the right tool
    * for high-sim thresholds and is exposed via [[lshTopK]]; the exact
    * operator stays exact.
    *
    * Quadratic BY CONTRACT, so the call is gated: pass
    * `exactAllPairs = true` to acknowledge O(n²) pair enumeration and
    * O(n·B) shuffle — a bounded-corpus tool. The production near-dup
    * default is the sub-quadratic LSH-candidates → exact-verify pipeline
    * ([[graft.dedup.Dedup.pipeline]]).
    *
    * The O(n²) stage itself is int8: pairs are first scanned over the
    * QUANTIZED corpus ([[quantCandidates]] — one-byte codes, integer
    * multiply-adds, ~8× narrower rows through the block replication)
    * against the threshold relaxed by a per-pair RIGOROUS error margin,
    * and only the surviving candidates are re-joined to the float
    * vectors and exact-verified with the same codegen cosine as before —
    * so the result is bit-identical to the pure-float version while the
    * float work drops from O(n²) to O(survivors). */
  def nearDupPairs(emb: DataFrame, threshold: Double,
                   maxBlockRows: Int = 65536,
                   exactAllPairs: Boolean = false): DataFrame = {
    require(exactAllPairs,
      "nearDupPairs is an EXACT all-pairs threshold join: O(n²) pair " +
      "enumeration by contract. Pass exactAllPairs=true for a bounded " +
      "corpus, or use Dedup.pipeline (LSH candidates + exact verify) at scale.")
    val spark = emb.sparkSession
    val qp = graft.Caching.materialize(Quantize.pairPrepared(emb))
    val survivors = quantCandidates(qp, threshold, maxBlockRows)
    // exact verify: only survivors fetch the float vectors back. The
    // survivor side is O(qualifying pairs) — tiny next to the corpus —
    // so AQE broadcasts it and neither vector fetch shuffles the corpus.
    val va = qp.select(col("vec_id").as("id_a"), col("v").as("v_a"))
    val vb = qp.select(col("vec_id").as("id_b"), col("v").as("v_b"))
    survivors.join(va, "id_a").join(vb, "id_b")
      .withColumn("sim_raw", graft.functions.GraftFunctions
        .cosine_sim(spark, col("v_a"), col("v_b")))
      .filter(col("sim_raw") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("vec_a"),
              greatest(col("id_a"), col("id_b")).as("vec_b"),
              round(col("sim_raw"), 4).as("sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Int8 pre-filter of the block-partitioned all-pairs scan: emits every
    * (id_a, id_b) whose QUANTIZED cosine clears `threshold` relaxed by a
    * per-pair margin that is a THEOREM, not a tuning knob. With
    * `a' = dq_a = a + e_a`, `δ_a = ||e_a||/||a||` (computed EXACTLY per
    * vector in [[Quantize.pairPrepared]], not bounded):
    *
    *   |cos(a',b') − cos(a,b)| ≤ 2(δ_a + δ_b + δ_a·δ_b)
    *                              / ((1−δ_a)(1−δ_b))          (δ < 1)
    *
    * (numerator: |<a',b'>−<a,b>| ≤ ||a||·||e_b|| + ||b||·||e_a|| +
    * ||e_a||·||e_b|| plus the norm-product drift, both ≤ the δ-terms;
    * denominator: ||a'||·||b'|| ≥ ||a||·||b||(1−δ_a)(1−δ_b).) Every pair
    * whose EXACT cosine ≥ threshold therefore has quantized cosine
    * ≥ threshold − margin and is kept: candidates ⊇ exact answer, proven,
    * and the follow-up float verify makes the final result exact. Pairs
    * the bound cannot cover (δ ≥ 1, zero norms) are passed through
    * unconditionally — the verify stage, not the pre-filter, decides.
    *
    * Per pair this evaluates ONE integer dot over one-byte codes
    * ([[graft.functions.QuantDot]], pure int multiply-adds in codegen)
    * plus O(1) scalar algebra — the dequantized dot is reconstructed
    * from per-vector scalars, never by materializing `dq`. */
  def quantCandidates(qp: DataFrame, threshold: Double,
                      maxBlockRows: Int = 65536): DataFrame = {
    val spark = qp.sparkSession
    val n = qp.count()
    // enough blocks to (a) bound SMJ buffering to maxBlockRows and
    // (b) keep all cores busy: B(B+1)/2 tasks >= default parallelism
    val forMemory = math.ceil(n.toDouble / maxBlockRows)
    val forCores = math.ceil(math.sqrt(2.0 * spark.sparkContext.defaultParallelism))
    val nBlocks = math.max(1L, math.max(forMemory.toLong,
      math.min(forCores.toLong, n / 64))).toInt
    val blockPairs = spark.createDataFrame(
      for { i <- 0 until nBlocks; j <- i until nBlocks } yield (i, j))
      .toDF("blk_i", "blk_j")
    val blk = pmod(xxhash64(col("vec_id")), lit(nBlocks)).cast("int")
    // only the codes + 5 scalars ride the O(n·B) replication — the float
    // vectors stay behind (the persisted layer prunes columns)
    val slim = qp.select("vec_id", "codes", "qmin", "qscale",
                         "s_lvl", "qnorm", "delta")
    val aSide = slim.withColumn("blk_i", blk)
      .join(blockPairs, "blk_i")
      .select(col("blk_i"), col("blk_j"), col("vec_id").as("id_a"),
        col("codes").as("c_a"), col("qmin").as("qmin_a"),
        col("qscale").as("qscale_a"), col("s_lvl").as("s_a"),
        col("qnorm").as("qnorm_a"), col("delta").as("d_a"))
    val bSide = slim.withColumn("blk_j", blk)
      .join(blockPairs, "blk_j")
      .select(col("blk_i"), col("blk_j"), col("vec_id").as("id_b"),
        col("codes").as("c_b"), col("qmin").as("qmin_b"),
        col("qscale").as("qscale_b"), col("s_lvl").as("s_b"),
        col("qnorm").as("qnorm_b"), col("delta").as("d_b"))
    val qdot = graft.functions.QuantDotFunction
      .quant_dot(spark, col("c_a"), col("c_b")).cast("double")
    val dotq = lit(Dim.toDouble) * col("qmin_a") * col("qmin_b") +
      col("qmin_a") * col("qscale_b") * col("s_b") +
      col("qmin_b") * col("qscale_a") * col("s_a") +
      col("qscale_a") * col("qscale_b") * qdot
    val qden = col("qnorm_a") * col("qnorm_b")
    val margin = (lit(2.0) * (col("d_a") + col("d_b") + col("d_a") * col("d_b"))) /
      ((lit(1.0) - col("d_a")) * (lit(1.0) - col("d_b")))
    // keep when bounded-and-clearing OR when the bound doesn't apply
    // (null/over-unit delta, zero quantized norm): never drop a pair the
    // theorem doesn't cover. The 1e-9 absorbs FP rounding of the margin
    // algebra itself.
    val unbounded = col("d_a").isNull || col("d_b").isNull ||
      col("d_a") >= 1.0 || col("d_b") >= 1.0 || !(qden > 0.0)
    aSide.join(bSide, Seq("blk_i", "blk_j"))
      // same-block pairs once via id order; cross-block pairs are unique
      // already (blocks are disjoint)
      .filter(col("blk_i") =!= col("blk_j") || col("id_a") < col("id_b"))
      .filter(unbounded || (dotq / qden >= lit(threshold) - margin - lit(1e-9)))
      .select("id_a", "id_b")
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

  /** Brute-force cosine top-k WITHIN a candidate predicate (round 16 —
    * the exact oracle for filtered ANN): queries are `vec_id <
    * nQueries` from the FULL frame (any document may ask), candidates
    * only the rows matching `candidateFilter` — the answer-set shape
    * of `IvfPq.probeFiltered`, computed exactly. Same plan shape as
    * [[bruteTopK]]: one filtered corpus scan against a broadcast query
    * set, no shuffle of the big side. */
  def bruteTopKFiltered(emb: DataFrame, candidateFilter: Column,
                        nQueries: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    val p = prepared(emb.filter(candidateFilter))
    val q = prepared(emb).filter(col("vec_id") < nQueries)
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
    // materialized: probed twice (query side + corpus side of the bucket
    // join); spill-safe and opt-out via graft.materialize (see Caching)
    val corpusBuckets = graft.Caching.materialize(bucketed(p, tables, bits, Dim))
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

  // ------------------------------------------------- LSH near-dup pairs

  /** Sub-quadratic embedding near-dup: sign-LSH bucket candidates +
    * exact verify — the scale exit for [[nearDupPairs]]'s gated O(n²)
    * all-pairs contract, at the HIGH thresholds where LSH is the right
    * tool (the docstring above derives why it is wrong at sim≈0.4,
    * where per-bit agreement is only ~0.63; at sim 0.9 it is ~0.86 and
    * climbs toward 1 as pairs approach true duplicates — which is where
    * near-dup mass actually lives).
    *
    * Candidate generation touches only same-(table, bucket) pairs —
    * O(Σ_buckets n_b²) instead of O(n²), with bucket occupancy driven
    * down exponentially by `bits` — and every candidate is re-verified
    * with the exact codegen cosine, so precision is 1.0 BY CONSTRUCTION:
    * no pair below `threshold` is ever emitted. Recall is the honest
    * LSH contract, with one certainty worth naming: two vectors with
    * IDENTICAL sign patterns (exact copies, positively-scaled copies —
    * the dominant duplicate mass in crawled/replicated corpora) land in
    * the same bucket in EVERY table, so true duplicates are found with
    * probability 1, deterministically; only borderline pairs near the
    * threshold are probabilistic (tables × bits trade recall vs
    * candidate volume, as in [[lshTopK]]).
    *
    * Scale shape: byte-identical vectors are CANONICALIZED first (one
    * row per distinct vector, members carried as a list) — replicated
    * corpora would otherwise make every bucket quadratic in the
    * replication factor before any pruning can help (measured at sf10's
    * 100×-replicated corpus: ~10⁹ raw candidate rows; collapsed, the
    * bucket search touches distinct vectors only and the quadratic term
    * moves to the member-pair expansion, which IS the output). The
    * bucket join carries (id, bucket) pairs only — vectors do NOT ride
    * the candidate shuffle; survivors fetch vectors back by id for the
    * verify. Candidate volume is then sized by `bits` ≈ log₂(distinct
    * corpus) keeping expected bucket width O(1). */
  def nearDupPairsAnn(emb: DataFrame, threshold: Double,
                      tables: Int = 4, bits: Int = 12): DataFrame = {
    val spark = emb.sparkSession
    val p = prepared(emb)
    // one canonical row per DISTINCT vector value; identical vectors are
    // cosine-1 duplicates by definition and expand afterwards
    val classes = graft.Caching.materialize(
      p.groupBy(col("v"))
        .agg(min(col("vec_id")).as("cid"), first(col("norm")).as("norm"),
             collect_list(col("vec_id")).as("members")))
    val pc = classes.select(col("cid").as("vec_id"), col("v"), col("norm"))
    // repartition the bucket frame on the join key: it inherits the
    // class aggregate's layout, and with the other side broadcast the
    // candidate join + pair-dedup would otherwise run on however few
    // partitions that left (the sf10 parallelism collapse). By-column —
    // no explicit width — so the exchange is an AQE-coalescible
    // REPARTITION_BY_COL: full session width at sf10, few tasks when the
    // bucket frame is small (the r10 sf0.1 regression clawed back)
    val b = bucketed(pc, tables, bits, Dim)
      .select(col("table_id"), col("bucket"), col("vec_id"))
      .repartition(col("table_id"), col("bucket"))
    val candidates = b.join(
        b.select(col("table_id"), col("bucket"), col("vec_id").as("id_b")),
        Seq("table_id", "bucket"))
      .filter(col("vec_id") < col("id_b"))
      .select(col("vec_id").as("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val va = pc.select(col("vec_id").as("id_a"), col("v").as("v_a"))
    val vb = pc.select(col("vec_id").as("id_b"), col("v").as("v_b"))
    val canonPairs = candidates.join(va, "id_a").join(vb, "id_b")
      .withColumn("sim_raw", graft.functions.GraftFunctions
        .cosine_sim(spark, col("v_a"), col("v_b")))
      .filter(col("sim_raw") >= threshold)
      .select(col("id_a").as("ca"), col("id_b").as("cb"),
              round(col("sim_raw"), 4).as("sim"))
    val m = classes.select(col("cid"), col("members"))
    // within-class pairs: the self-cosine through the SAME codegen
    // expression a raw pair of identical vectors would have computed
    val within = classes.filter(size(col("members")) > 1)
      .withColumn("sim", round(graft.functions.GraftFunctions
        .cosine_sim(spark, col("v"), col("v")), 4))
      .filter(col("sim") >= threshold)
      .select(explode(col("members")).as("vec_a"), col("members"), col("sim"))
      .select(col("vec_a"), explode(col("members")).as("vec_b"), col("sim"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b", "sim")
    // cross-class pairs: the canonical sim holds for every member
    // combination (members are byte-identical to their canonical)
    val cross = canonPairs
      .join(m.select(col("cid").as("ca"), col("members").as("ma")), Seq("ca"))
      .join(m.select(col("cid").as("cb"), col("members").as("mb")), Seq("cb"))
      .select(explode(col("ma")).as("a"), col("mb"), col("sim"))
      .select(col("a"), explode(col("mb")).as("b"), col("sim"))
      .select(least(col("a"), col("b")).as("vec_a"),
              greatest(col("a"), col("b")).as("vec_b"), col("sim"))
    within.unionByName(cross)
  }
}
