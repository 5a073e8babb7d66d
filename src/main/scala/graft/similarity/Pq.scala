package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding stores — the codebook member
  * of the quantization family ([[Quantize]] is the scalar one): the
  * vector splits into `m` subvectors, each subspace trains a `k`-entry
  * codebook by L2 k-means, and a vector stores only its m codebook
  * indexes — at m=16, k=16 a 64-dim float64 embedding (512 B) becomes
  * 16 nibbles (8 B), a 64× reduction, with the scan reading codes plus
  * O(m·k·d/m) centroid METADATA instead of the raw vectors. This is the
  * compression regime IVF-PQ engines (FAISS-style) run at billion-vector
  * scale, and the probe realizes it: an ADC (asymmetric-distance) scan —
  * per query, an m×k lookup table of subspace partial dot products is
  * precomputed on the driver and the corpus-side similarity is m
  * statically-unrolled array lookups over the nibble codes, inside
  * whole-stage codegen. The scan reads ~16 B/row; no vector is ever
  * reconstructed, no shuffle, no UDF.
  *
  * Lifecycle: train + encode happen ONCE ([[buildIndex]]/[[indexFor]] —
  * the persisted code table is the stored artifact, like FAISS's index
  * file); every probe is pure read path over it.
  *
  * Scale shape: codebooks are driver metadata entering the plan as ONE
  * literal (like [[Ivf]]'s centroids); training's only shuffle is the
  * (subspace, code, dim) partial-mean reduce — m·k·(d/m) = k·d rows.
  * Determinism: hash-seeded codebooks (no RNG), DECIMAL means
  * (merge-order-independent), struct-argmin ties to the lower code.
  */
object Pq {

  /** Codebooks as (subspace)(code) -> centroid (length d/m). */
  type Codebooks = Seq[Seq[Seq[Double]]]

  /** Vectors the training pass reads — codebooks converge on a sample
    * (FAISS-style engines train PQ on a bounded sample at any corpus
    * size; 64k is 4096 vectors per codebook entry at k=16); the full
    * corpus is only ever ENCODED (one projection). Deterministic:
    * stride-hash membership, no RNG. */
  private val TrainTarget = 65536L

  /** Train codebooks: `iters` Lloyd rounds per subspace, all m subspaces
    * in one frame. `emb` must carry `vec_id` and `embedding`. Training
    * reads a deterministic ~[[TrainTarget]]-vector hash-sample of the
    * corpus — O(1) training memory/time at any corpus size, the
    * standard PQ regime. Assignment runs through the native
    * [[graft.functions.PqEncode]] expression (the SQL HOF encode paid
    * one interpreted lambda dispatch per (row, subspace, code) — at
    * byte codes that measured ~24 min for the one-time sf10 build). */
  def train(emb: DataFrame, m: Int = 16, k: Int = 16, iters: Int = 3): Codebooks = {
    val spark = emb.sparkSession
    val n = emb.count()
    val stride = math.max(1L, (n + TrainTarget - 1) / TrainTarget)
    val sample =
      if (stride == 1L) emb
      else emb.filter(pmod(xxhash64(col("vec_id")), lit(stride)) === 0)
    // localCheckpoint, not persist (optimization r17): the sample is
    // BOUNDED (~TrainTarget rows) so executor-local materialization is
    // safe at any corpus size, and it truncates the caller's lineage —
    // IVF×PQ hands in a residual frame whose plan carries the centroid
    // literals, and every Lloyd round's action was re-analyzing and
    // cache-comparing that plan (the rebalanceCells lesson, applied to
    // training). Values are identical: the checkpoint materializes the
    // same deterministic projection the persisted frame computed.
    val p = sample.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .localCheckpoint()
    // deterministic seeds: the k sample vectors of smallest
    // xxhash64(vec_id) — a distributed top-k (TakeOrdered), k rows of
    // driver metadata; every subspace seeds from the same vectors'
    // j-th subvector (bit-identical to the old per-subspace window,
    // whose hash order never depended on j)
    val seedRows = p.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .select(col("v")).collect()
    require(seedRows.nonEmpty, "PQ training sample is empty")
    // dimensionality from the already-collected seeds — the dedicated
    // `first()` this replaces was a whole extra Spark action per train
    // (optimization r16)
    val d = seedRows.head.getSeq[Double](0).size
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val subd = d / m
    var cb: Codebooks = (0 until m).map { j =>
      seedRows.toSeq.map(_.getSeq[Double](0).slice(j * subd, (j + 1) * subd))
    }
    var i = 0
    while (i < iters) {
      // exact DECIMAL mean per (j, code, dim) — k·d shuffle rows, map-side
      // partials; an empty cluster keeps its previous centroid
      val means = p
        .withColumn("codes",
          graft.functions.PqEncodeFunction.pq_encode(spark, col("v"), cb))
        .select(col("codes"), posexplode(expr(
          s"transform(sequence(0, ${m - 1}), j -> slice(v, j * $subd + 1, $subd))"))
          .as(Seq("j", "sub")))
        .select(col("j"), expr("codes[j]").as("code"),
          posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy("j", "code", "pos")
        .agg(avg(col("x").cast("decimal(25,16)")).cast("double").as("mu"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (jc, rows) =>
          jc -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq }
      cb = cb.zipWithIndex.map { case (codes, j) =>
        codes.zipWithIndex.map { case (old, c) => means.getOrElse((j, c), old) }
      }
      i += 1
    }
    cb
  }

  /** (vec_id, codes: array<int> of length m) — the encoded corpus. The
    * whole encode is ONE projection through the native
    * [[graft.functions.PqEncode]] expression (codebook = expression
    * metadata, three primitive loops in whole-stage codegen).
    * `extraCols` pass through untouched (IVF×PQ keeps the cell id). */
  def encode(emb: DataFrame, cb: Codebooks,
             extraCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = emb.sparkSession
    emb.select(col("vec_id") +:
        expr("transform(embedding, x -> cast(x as double))").as("v") +:
        extraCols.map(col): _*)
      .withColumn("codes",
        graft.functions.PqEncodeFunction.pq_encode(spark, col("v"), cb))
      .select(("vec_id" +: "codes" +: extraCols).map(col): _*)
  }

  /** A trained-and-encoded PQ index: the codebooks (driver metadata)
    * plus the parquet code table `(vec_id, codes, rnorm)` — 16 nibble
    * codes and one precomputed reconstruction norm per row, the ~16 B/row
    * artifact an engine persists ONCE and serves every subsequent probe
    * from. `rnorm = |x̂|` is query-independent, so it is paid at encode
    * time, never per probe. */
  final case class PqIndex(cb: Codebooks, codesPath: String)

  /** Session-lifetime index store (production: the persisted code-table
    * location in the catalog). Keyed by a caller-supplied identity for
    * the corpus (e.g. its table path) + the PQ shape; a repeated probe —
    * a warm bench pass, a second query batch — reuses the trained
    * codebooks and written code table instead of re-running Lloyd and
    * re-encoding. Plain driver state + an on-disk parquet dir, so it
    * survives `spark.catalog.clearCache()` by design. */
  private val indexStore =
    new java.util.concurrent.ConcurrentHashMap[String, PqIndex]()

  /** Squared L2 norm of every centroid, (subspace)(code) — the driver
    * metadata the corpus-side norm lookup scans instead of centroids. */
  private def centroidNorm2(cb: Codebooks): Seq[Seq[Double]] =
    cb.map(_.map(c => c.map(x => x * x).sum))

  /** `(vec_id, codes, rnorm)` — the encode projection plus the
    * precomputed reconstruction norm `|x̂| = sqrt(Σ_j |c_{j,codes_j}|²)`
    * (m lookups into the squared-norm literal, query-independent so it
    * is paid once at encode time). */
  private[similarity] def encodeWithNorm(emb: DataFrame, cb: Codebooks,
      extraCols: Seq[String] = Seq.empty): DataFrame =
    // native lookup expression: the norm table is expression metadata,
    // not an array literal inlined into every reference; arithmetic
    // order bit-identical (optimization r17 — [[graft.functions.PqNorm]])
    encode(emb, cb, extraCols)
      .withColumn("rnorm", graft.functions.PqRnormFunction.pq_norm(
        emb.sparkSession, col("codes"), centroidNorm2(cb)))
      .select(("vec_id" +: "codes" +: "rnorm" +: extraCols).map(col): _*)

  /** Per-query ADC lookup table: lut[j][c] = q_subvector_j ·
    * centroid_{j,c} — k·d driver multiplies per query. */
  private[similarity] def adcLut(cb: Codebooks, v: Seq[Double]): Seq[Seq[Double]] = {
    val subd = cb.head.head.size
    cb.zipWithIndex.map { case (codes, j) =>
      codes.map(c => (0 until subd).map(i => v(j * subd + i) * c(i)).sum)
    }
  }

  /** Train + encode + write the code table. With `sessionLifetime` the
    * dir survives per-scenario scratch cleanup (the bucketed-tables
    * discipline); otherwise it registers with [[graft.TempDirs]]. */
  def buildIndex(emb: DataFrame, m: Int = 16, k: Int = 16, iters: Int = 3,
                 sessionLifetime: Boolean = false): PqIndex = {
    val cb = train(emb, m, k, iters)
    val dir =
      if (sessionLifetime) graft.TempDirs.createSessionLifetime("pqindex_keep")
      else graft.TempDirs.create("pqindex")
    encodeWithNorm(emb, cb).write.mode("overwrite").parquet(dir)
    PqIndex(cb, dir)
  }

  /** Per-file signatures `path:length:mtime` of a frame's leaf input
    * files, sorted — the unit [[contentFingerprint]] hashes, and (round
    * 13) what [[AnnIndexStore]] persists verbatim so APPEND-ONLY corpus
    * growth is detectable: a stored signature set that is a strict
    * subset of the current one, every stored file unchanged, means the
    * old index covers a prefix of the corpus and only the new files
    * need encoding. */
  private[similarity] def fileSignatures(df: DataFrame): Seq[String] = {
    val files = df.inputFiles.sorted.toSeq
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(hconf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
  }

  /** Fingerprint of a frame's underlying files — (path, length, mtime)
    * of every leaf input file, hashed. Folded into session index-store
    * keys so a REGENERATED source table (same path, new bytes) misses
    * the cache and retrains instead of silently serving stale codes. */
  private[similarity] def contentFingerprint(df: DataFrame): String =
    fingerprintOf(fileSignatures(df))

  private[similarity] def fingerprintOf(sigs: Seq[String]): String =
    if (sigs.isEmpty) "nofiles"
    else (scala.util.hashing.MurmurHash3.stringHash(sigs.mkString("|"))
      & 0xffffffffL).toHexString

  /** The index for `key`, building it on first use (train once, probe
    * many — the FAISS lifecycle). The stored key carries the source
    * files' content fingerprint: regenerating the table at the same
    * path invalidates the cached index. */
  def indexFor(emb: DataFrame, key: String, m: Int = 16, k: Int = 16,
               iters: Int = 3): PqIndex =
    indexStore.computeIfAbsent(
      s"$key|fp=${contentFingerprint(emb)}|m=$m|k=$k|i=$iters",
      _ => buildIndex(emb, m, k, iters, sessionLifetime = true))

  /** PQ top-k with exact re-ranking — the production IVF-PQ read shape:
    * (1) the SHORTLIST pass is an ADC (asymmetric-distance) scan over the
    * CODE TABLE ONLY: per query the m×k table of subspace partial dot
    * products (query subvector · centroid) is computed on the driver
    * (k·d multiplies — metadata) and shipped in a broadcast row, and a
    * corpus row's reconstructed dot product is m statically-unrolled
    * array lookups `lut[j][codes[j]]` — the scan reads ~16 B/row (codes +
    * precomputed |x̂|) and never touches, reconstructs, or multiplies a
    * full-width vector; (2) the REFINE pass re-ranks only the surviving
    * `shortlist` candidates per query against their exact vectors — a
    * candidate-sized join, so full-precision data is touched for
    * O(queries × shortlist) rows however large the corpus. Queries stay
    * exact throughout (they are few — that is the asymmetry).
    *
    * `indexKey` selects the train-once path: the codebooks + code table
    * persist in the session [[indexStore]] under that key and every
    * later call with the same key is pure read path. Without a key the
    * index builds inline into scenario scratch. */
  def topK(emb: DataFrame, nQueries: Int, kNeighbors: Int,
           m: Int = 16, k: Int = 16, iters: Int = 3,
           shortlist: Int = 50, indexKey: Option[String] = None): DataFrame = {
    val idx = indexKey match {
      case Some(key) => indexFor(emb, key, m, k, iters)
      case None => buildIndex(emb, m, k, iters)
    }
    probe(emb, idx, nQueries, kNeighbors, shortlist)
  }

  /** The pure READ path over an already-built index — what a probe costs
    * once the artifact exists, whether it came from this session's
    * [[indexFor]] or a catalog load ([[AnnIndexStore]]). */
  def probe(emb: DataFrame, idx: PqIndex, nQueries: Int, kNeighbors: Int,
            shortlist: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = idx.cb.size
    // the query batch is driver metadata by contract (few queries, like
    // Ivf's centroids): one pushed-down point read collects it, and the
    // per-query LUT — lut[j][c] = q_subvector_j · centroid_{j,c} — is
    // k·d driver multiplies per query
    val qRows = collectQueries(emb, nQueries)
    val qMeta = qRows.toSeq.map { r =>
      (r.getLong(0), adcLut(idx.cb, r.getSeq[Double](1)), r.getDouble(2))
    }
    val q = broadcast(qMeta.toDF("query_id", "__lut", "__qnorm"))
    val scored = codesFrame(spark, idx.codesPath)
      .join(q, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcSim(m).as("pqsim"))
    refineExact(emb, adcShortlist(scored, shortlist), qRows, kNeighbors)
  }

  /** A code table by path — a plain parquet dir (session scratch) or a
    * txlog table (the catalog-persisted artifact; reading through the
    * log keeps only LIVE files visible and partition pruning intact). */
  private[similarity] def codesFrame(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    if (graft.acid.TxLog.exists(spark, path)) graft.acid.TxLog.read(spark, path)
    else spark.read.parquet(path)

  /** `(vec_id, v, norm)` rows of the query batch — one pushed-down
    * point read; bounded driver metadata by the few-queries contract. */
  private[similarity] def collectQueries(emb: DataFrame, nQueries: Int) =
    Cosine.prepared(emb).filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("v"), col("norm")).collect()

  /** ADC similarity: cos(q, x̂) = Σ_j lut[j][codes[j]] / (|q|·|x̂|) — m
    * statically-unrolled lookups per pair, all inside whole-stage
    * codegen. Expects columns `codes`, `rnorm`, `__lut`, `__qnorm`. */
  private[similarity] def adcSim(m: Int): Column = {
    val adcDot = (0 until m).map(j => s"__lut[$j][codes[$j]]").mkString(" + ")
    expr(adcDot) / (col("__qnorm") * col("rnorm"))
  }

  /** ADC similarity for RESIDUAL codes (IVF×PQ): x̂ = c_cell + r̂, so
    * q·x̂ = q·c_cell + Σ_j lut[j][codes[j]] — the first term rides in as
    * the per-(query, cell) `__off` column (driver metadata, one scalar
    * per probe row), the lookups stay the identical ~16 B/row scan. */
  private[similarity] def adcSimOffset(m: Int): Column = {
    val adcDot = (0 until m).map(j => s"__lut[$j][codes[$j]]").mkString(" + ")
    (expr(adcDot) + col("__off")) / (col("__qnorm") * col("rnorm"))
  }

  /** Two-level per-query top-`shortlist` over a scored (query_id,
    * neighbor_id, pqsim) stream: a per-(query, salt) local rank first
    * (parallelism queries×64, each sorting its slice), then the global
    * per-query rank over the O(queries×64×shortlist) survivors — a
    * single-level window would sort the whole queries×corpus stream in
    * |queries| tasks (measured ~20 min/pass at sf10; this shape is
    * minutes → seconds). */
  private[similarity] def adcShortlist(scored: DataFrame, shortlist: Int): DataFrame = {
    val wLocal = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("pqsim").desc, col("neighbor_id"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("pqsim").desc, col("neighbor_id"))
    scored
      .withColumn("salt", pmod(xxhash64(col("neighbor_id")), lit(64)))
      .withColumn("lrank", row_number().over(wLocal))
      .filter(col("lrank") <= shortlist)
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .select("query_id", "neighbor_id")
  }

  /** Exact re-rank of a (query_id, neighbor_id) candidate set: one
    * candidate-sized join against the full-precision vectors; the query
    * vectors re-enter from the collected batch (no second corpus scan
    * for them). */
  private[similarity] def refineExact(emb: DataFrame, candidates: DataFrame,
      qRows: Array[org.apache.spark.sql.Row], kNeighbors: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val exact = Cosine.prepared(emb).select(col("vec_id"), col("v"))
    val qv = broadcast(qRows.toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toDF("query_id", "qv"))
    val wR = Window.partitionBy(col("query_id"))
      .orderBy(col("rawsim").desc, col("neighbor_id"))
    candidates
      .join(exact.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("v", "nv"), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosine_sim(spark, col("qv"), col("nv"))
          .as("rawsim"))
      .withColumn("rank", row_number().over(wR).cast("long"))
      .filter(col("rank") <= kNeighbors)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("rawsim"), 4).as("sim"))
      .orderBy("query_id", "rank")
  }
}
