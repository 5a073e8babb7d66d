package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale design: nothing here ever cross-joins the corpus. Exact dedup is
  * one hash-shuffle on the content key. MinHash/SimHash candidate
  * generation explodes each doc into a FIXED number of (band, hash)
  * tuples and self-joins on the band hash — the shuffle volume is
  * O(docs × bands), and only same-bucket pairs are materialized.
  * Verification (exact n-gram Jaccard) runs on candidate pairs only.
  */
object Dedup {

  // -------------------------------------------------------------- exact

  /** Exact dedup on normalized content: one row per distinct text with the
    * keeper (min doc_id) and the duplicate count. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(lower(trim(col(textCol)))).as("content_key"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")

  // ------------------------------------------------------------- minhash

  val NumPerm = 32
  val Bands = 8
  val RowsPerBand: Int = NumPerm / Bands

  /** doc frame → (doc_id, sig: array<bigint> of NumPerm minhashes over
    * word-3-gram shingles), via the native codegen expression
    * [[graft.functions.MinHashSig]] — a per-row loop, zero shuffle. The
    * signature never leaves the document's task; hashing is identical to
    * `xxhash64(shingle, perm)`.
    *
    * Alternative shape for pathological corpora (single documents large
    * enough to dominate a task): explode(shingles) →
    * groupBy(doc_id).agg(min(xxhash64(shingle, i))...), which buys
    * shingle-level parallelism for one extra shuffle. */
  def minhashSignatures(docs: DataFrame, textCol: String = "text"): DataFrame =
    TextOps.withShingles(docs, textCol, 3)
      .select(col("doc_id"),
        graft.functions.SketchFunctions.minhash_sig(docs.sparkSession,
          col("shingles"), NumPerm).as("sig"))

  /** Materialized signature frame — the self-joins below would otherwise
    * recompute the signature pipeline per side and per downstream caller
    * (Spark's cache manager dedupes by canonicalized plan, so every
    * caller in a session shares one materialization). At cluster scale
    * this is a persisted signature table; locally it is spill-safe
    * MEMORY_AND_DISK, opt-out via graft.materialize (see [[graft.Caching]]). */
  private def cachedSignatures(docs: DataFrame, textCol: String): DataFrame =
    graft.Caching.materialize(minhashSignatures(docs, textCol))

  /** Candidate id-pairs from LSH banding: pairs agreeing on any of the
    * `Bands` band-hashes. Only (doc_id, band) tuples travel through the
    * self-join — signatures (512-byte arrays) would force the pair dedup
    * into a SortAggregate and bloat the shuffle. */
  /** Band hashes from a signature frame: (doc_id, band_idx, band_hash),
    * one row per band — the LSH index row format shared by the batch
    * self-join below and the persisted incremental index
    * ([[IncrementalDedup]]). */
  private[dedup] def bandsOfSignatures(sigs: DataFrame): DataFrame =
    sigs.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), " +
        s"j -> xxhash64(concat_ws('|', transform(slice(sig, j * $RowsPerBand + 1, $RowsPerBand), x -> cast(x as string))), j))"))
        .as(Seq("band_idx", "band_hash")))

  def minhashCandidatePairs(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sigs = cachedSignatures(docs, textCol)
    val banded = bandsOfSignatures(sigs)
    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** LSH near-dup candidates with the signature-estimated Jaccard
    * (fraction of agreeing positions). Signatures are re-attached to the
    * candidate pairs with plain shuffle joins: the signature relation is
    * O(corpus) and must never be broadcast; the shuffle moves the (small)
    * candidate list twice plus the signature table once, and AQE is free
    * to downgrade to broadcast when the runtime sizes actually allow it. */
  def minhashCandidates(docs: DataFrame, textCol: String = "text",
                        minEstJaccard: Double = 0.5): DataFrame = {
    val sigs = cachedSignatures(docs, textCol)
    minhashCandidatePairs(docs, textCol)
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("est_jaccard", round(
        graft.functions.SketchFunctions.sig_agreement(docs.sparkSession,
          col("sig_a"), col("sig_b")) / lit(NumPerm.toDouble), 4))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash per doc over distinct tokens, via the native codegen
    * expression [[graft.functions.SimHash64]] — per-row loop, zero
    * shuffle (replaces an explode → 64-column weighted-sum aggregate
    * whose generated code janino took seconds to compile). */
  def simhashes(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SketchFunctions.simhash64(docs.sparkSession,
        array_distinct(graft.text.TextOps.tokens(col(textCol)))).as("simhash"))

  /** Hamming-band candidates: 4 bands of 16 bits; any-band equality →
    * candidate; keep pairs with hamming distance <= maxHamming. */
  def simhashCandidates(docs: DataFrame, textCol: String = "text",
                        maxHamming: Int = 3): DataFrame =
    hammingBandPairs(simhashes(docs, textCol), "simhash", maxHamming)

  /** Hamming-band near-dup pairs over ANY 64-bit signature relation
    * `(doc_id, <hashCol>)` — the shared kernel behind the SimHash text
    * near-dup and the pHash image near-dup: 4 bands of 16 bits, any-band
    * equality → candidate, exact `bit_count` verify.
    *
    * Two contracts, split at maxHamming = 3 by pigeonhole: a pair
    * differing in ≤3 bits cannot differ in all 4 bands, so it collides
    * in at least one — recall 1.0 GUARANTEED at any corpus size, while
    * the scan stays sub-quadratic (O(Σ per-band bucket²) candidates,
    * each verified with one XOR+popcount). Above 3 the banding is
    * honest LSH: a 4+-bit difference CAN straddle all 4 bands, so
    * recall on the 4..maxHamming range is probabilistic (still high —
    * the differing bits must spread across every band to hide).
    * Callers whose downstream math assumes the full pair set (the
    * pHash census oracle, any exact-twin law) pass `exact = true`, and
    * a threshold the banding cannot guarantee becomes a hard error
    * instead of silently shipped duplicates. */
  def hammingBandPairs(sigs: DataFrame, hashCol: String,
                       maxHamming: Int = 3, exact: Boolean = false): DataFrame = {
    require(!exact || maxHamming <= 3,
      s"4x16-band hamming search is exact only for maxHamming <= 3 " +
      s"(got $maxHamming): a 4-bit difference can straddle all 4 bands")
    val spark = sigs.sparkSession
    // CANONICALIZE before banding: replicated/crawled corpora carry many
    // byte-identical signatures, and banding them raw makes every bucket
    // quadratic in the replication factor BEFORE any pruning can help —
    // at sf10 (a 100×-replicated corpus) the raw band join pushed ~10⁹
    // candidate rows through the pair-dedup aggregate (measured: six
    // ~30-CPU-minute spilling stragglers). Identical signatures are
    // hamming-0 by definition, so: collapse to one canonical row per
    // DISTINCT signature, band-search only those, then expand member
    // pairs — output-identical, and the quadratic term moves from the
    // candidate join (wasted work) to the expansion (which IS the
    // output: every expanded row is an emitted duplicate pair).
    val classes = graft.Caching.materialize(
      sigs.groupBy(col(hashCol).as("__sig"))
        .agg(min(col("doc_id")).as("cid"),
             collect_list(col("doc_id")).as("members")))
    // band-join over distinct signatures only; repartition the banded
    // frame on the join key — it inherits the class aggregate's layout,
    // and with the other side broadcast nothing downstream re-partitions.
    // By-column (no explicit width): the exchange fans out to the session
    // width at scale, but stays an AQE-coalescible REPARTITION_BY_COL so
    // a small banded frame collapses back to few tasks instead of paying
    // 32 near-empty sorts (the r10 sf0.1 regression)
    val banded = classes.select(col("cid"), col("__sig"),
        posexplode(expr(
          "transform(sequence(0, 3), j -> (__sig >> (j * 16)) & 65535)"))
          .as(Seq("band_idx", "band_val")))
      .repartition(col("band_idx"), col("band_val"))
    // distinct signatures ⇒ every canonical pair has hamming ≥ 1
    val canonPairs = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.cid") < col("b.cid"))
      .select(col("a.cid").as("ca"), col("b.cid").as("cb"),
        bit_count(col("a.__sig").bitwiseXOR(col("b.__sig"))).cast("long")
          .as("hamming"))
      // hamming filter BEFORE the pair dedup: shrinks the aggregate input
      // by the band-collision multiplicity (cheap bit_count vs shuffling
      // every collision)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("ca", "cb")
    val m = classes.select(col("cid"), col("members"))
    // within-class pairs: every member pair of a shared signature
    val within = classes.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("doc_a"), col("members"))
      .select(col("doc_a"), explode(col("members")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", lit(0L))
    // cross-class pairs: the canonical pair's hamming holds for every
    // member combination (members share their class signature verbatim)
    val cross = canonPairs
      .join(m.select(col("cid").as("ca"), col("members").as("ma")), Seq("ca"))
      .join(m.select(col("cid").as("cb"), col("members").as("mb")), Seq("cb"))
      .select(explode(col("ma")).as("a"), col("mb"), col("hamming"))
      .select(col("a"), explode(col("mb")).as("b"), col("hamming"))
      .select(least(col("a"), col("b")).as("doc_a"),
              greatest(col("a"), col("b")).as("doc_b"), col("hamming"))
    within.unionByName(cross).orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------- near-dup cluster assembly

  /** Connected components over a candidate-pair edge list → (node,
    * cluster) with cluster = min node id of the component. Iterative
    * min-label propagation (the Pregel CC algorithm as DataFrame joins):
    * per round, each node takes the min of its own and its neighbors'
    * labels; converges in diameter(component) rounds — near-dup clusters
    * are shallow, so a handful. Edges are the (tiny) LSH candidate set,
    * never the corpus, so each round is a join on edges only. */
  /** Edge-count pivot between the driver union-find and the distributed
    * loop: a candidate graph below this is join-overhead-bound (each
    * distributed round costs ~2 jobs), above it driver memory would be
    * the limit. */
  val SmallGraphEdges = 1000000L

  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (eager) per round: iterative lineage otherwise
    // nests the upstream candidate-generation subtree once per iteration
    // — plans grow unboundedly (explain/optimizer cost, eventually OOM).
    // At cluster scale this becomes checkpoint() to reliable storage.
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct().localCheckpoint(true)
    if (edges.count() <= SmallGraphEdges) return unionFindLocal(edges)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("node").as("b"), col("label").as("lb")), Seq("b"))
        .groupBy(col("a").as("node")).agg(min(col("lb")).as("nmin"))
      val next = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old")).count()
      labels = next
      done = changed == 0
      iter += 1
    }
    // Non-convergence must be loud: labels from a truncated propagation
    // are silently wrong cluster assignments (→ wrong keep/drop lists).
    // maxIter bounds the component diameter, not the node count; raise it
    // (or pre-contract with large-star/small-star) for long-chain graphs.
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds; " +
      "component diameter exceeds maxIter — raise maxIter")
    labels.select(col("node"), col("label").as("cluster")).orderBy("node")
  }

  /** Driver union-find for candidate graphs that fit in memory — LSH
    * candidate sets are ~0.01% of the corpus, so this is the common
    * case; the distributed loop above is the safety net. Labels are the
    * component minimum (same fixed point as the propagation). */
  private def unionFindLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val out = parent.keys.toSeq.sorted.map(n => (n, find(n)))
    spark.createDataFrame(out).toDF("node", "cluster").orderBy("node")
  }

  // --------------------------------------------------- composed pipeline

  /** THE production near-dup entry point — the composed pipeline a
    * training-data curation run executes, every stage sub-quadratic:
    *
    *   1. exact dedup (one hash shuffle on the normalized-content key):
    *      duplicates drop against the min-id keeper, reason `exact`;
    *   2. on the exact KEEPERS only: MinHash-LSH candidates (shuffle
    *      O(docs × bands)) → exact n-gram-Jaccard verify on candidate
    *      pairs only → connected components → min-id keeper per
    *      cluster; the rest drop with reason `near`.
    *
    * Exact-first matters: replicated corpora make band-collision volume
    * Θ(Σ group²), so removing exact copies before banding collapses the
    * dominant term (SCALE.md). The quadratic embedding all-pairs join is
    * deliberately NOT in this path — it is a bounded-corpus tool gated
    * behind `exactAllPairs=true` (see
    * [[graft.similarity.Cosine.nearDupPairs]]); at realistic near-dup
    * thresholds LSH-candidates → exact-verify is the 100 TB shape.
    *
    * A `near` drop's keeper can itself be an `exact` keeper that a
    * larger cluster dropped — consumers resolve keeper chains
    * transitively, exactly as with Delta-style tombstone chains. */
  def pipeline(docs: DataFrame, textCol: String = "text",
               minJaccard: Double = 0.2): DataFrame = {
    val keyed = graft.Caching.materialize(
      docs.select(col("doc_id"),
        md5(lower(trim(col(textCol)))).as("content_key")))
    val keepers = keyed.groupBy("content_key").agg(min(col("doc_id")).as("keeper"))
    val exactDrops = keyed.join(keepers, Seq("content_key"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id").as("drop_id"), col("keeper"),
              lit("exact").as("reason"))
    val keeperDocs = docs.join(
      keepers.select(col("keeper").as("doc_id")), Seq("doc_id"), "left_semi")
    val nearPairs = ngramJaccard(keeperDocs, textCol, minJaccard)
      .select("doc_a", "doc_b")
    val nearDrops = connectedComponents(nearPairs)
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as("drop_id"), col("cluster").as("keeper"),
              lit("near").as("reason"))
    exactDrops.unionByName(nearDrops).orderBy("drop_id")
  }

  // ------------------------------------------------- exact n-gram verify

  /** Exact word-3-gram Jaccard over the MinHash candidate pairs — the
    * verify stage of the dedup pipeline (candidates only; never all
    * pairs). */
  def ngramJaccard(docs: DataFrame, textCol: String = "text",
                   minJaccard: Double = 0.2): DataFrame = {
    val shingled = TextOps.withShingles(docs, textCol, 3)
      .select("doc_id", "shingles")
    val cands = minhashCandidatePairs(docs, textCol)
    cands
      .join(shingled.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("shingles", "sh_a"), Seq("doc_a"))
      .join(shingled.withColumnRenamed("doc_id", "doc_b")
                    .withColumnRenamed("shingles", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }
}
