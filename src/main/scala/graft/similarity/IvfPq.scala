package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF×PQ — the billion-vector production read path, composing the two
  * halves this library already carries: [[Ivf]] partitions the corpus
  * into Voronoi cells (a query probes only its `nprobe` nearest), and
  * [[Pq]] stores each vector as 16 BYTE codes (k=256 codebooks — the
  * FAISS `PQ16` default; round 11, up from nibbles) scanned by
  * asymmetric-distance lookup tables. Composed, the probe cost is
  * O(corpus × nprobe / nCells) rows × 16 B/row — sub-linear in BOTH
  * dimensions: the cell filter prunes which rows are read, the codes
  * shrink what a read costs. Separately each half is a demo; together
  * they are the FAISS `IVFx,PQy` shape.
  *
  * Recall regime (measured, sf0.1, top-10 vs brute force): byte codes
  * are 16× finer per subspace at IDENTICAL scan bytes, moving the
  * recall limiter from code precision to cell selection — at nprobe=16
  * (no pruning) recall is 0.99–1.0, so the nprobe knob now buys exactly
  * the documented trade: nprobe=4 → mean ~0.61, nprobe=8 → min ~0.70 /
  * mean ~0.83, nprobe=10 (default) → min 0.6–0.8 / mean 0.86–0.90
  * across SFs while still skipping 6 of 16 cells. The
  * synthetic corpus is near-orthogonal (max inter-vector cosine ~0.5),
  * the WORST case for Voronoi locality — clustered real-world
  * embeddings concentrate neighbors in fewer cells.
  *
  * Index layout: the code table is written PARTITIONED BY CELL, so the
  * probe's `cell IN (probed…)` predicate is directory-level partition
  * pruning — the parquet scan never opens a non-probed cell's files.
  * That is the on-disk analogue of FAISS's inverted lists, expressed as
  * the same partition-pruning machinery every other table here uses.
  *
  * Codes are RESIDUAL-encoded (round 10, FAISS `by_residual`): each
  * vector stores the quantized form of `x − centroid(cell)`, so the
  * 16-nibble budget spends on structure LOCAL to the cell instead of
  * re-describing where the cell sits in space — the standard recall
  * lift at identical code size. The reconstruction is `x̂ = c_cell +
  * r̂`, and everything that changes is driver METADATA: the scan-side
  * norm `|c_cell + r̂|` folds into the precomputed per-row `rnorm` at
  * encode time (cell/codebook cross-dot tables, nCells·m·k doubles),
  * and the probe adds one per-(query, cell) scalar `q·c_cell` to the
  * same m-lookup ADC sum. The scanned bytes per row do not change.
  *
  * Probe-side math is all driver metadata: cell selection ranks the
  * query against the IVF centroid literals, the ADC lookup table is
  * k·d multiplies per query — the cluster only ever scans codes. */
object IvfPq {

  /** Codebooks + IVF centroids + the cell-partitioned code table. */
  final case class IvfPqIndex(cb: Pq.Codebooks,
                              centroids: Seq[(Int, Seq[Double])],
                              codesPath: String)

  private val indexStore =
    new java.util.concurrent.ConcurrentHashMap[String, IvfPqIndex]()

  /** Train both halves WITHOUT writing anything (optimization r17):
    * returns (codebooks, centroids, cached residual frame, code-row
    * frame). Callers that persist the code table through their own
    * commit machinery ([[AnnIndexStore.ivfPqIndex]]) stage the code-row
    * frame DIRECTLY instead of writing a scratch parquet dir and
    * re-reading it — the old retrain path wrote the full encode twice
    * (scratch + table) and read it back once in between, pure I/O at
    * corpus scale. The residual frame is Caching-materialized (it feeds
    * PQ training, the drift sample, and the code-row evaluation);
    * callers unpersist it once the code rows are materialized. */
  private[similarity] def trainArtifacts(emb: DataFrame, nCells: Int, m: Int,
      k: Int, iters: Int, extraCols: Seq[String] = Seq.empty)
      : (Pq.Codebooks, Seq[(Int, Seq[Double])], DataFrame, DataFrame) = {
    // extra (provenance) columns ride Ivf.train's one materialized
    // prepared frame end to end — the second full-corpus assignment
    // pass this replaces was a whole extra scan (optimization r17)
    val (assigned, centroids) = Ivf.train(emb, nCells, iters, extraCols)
    // the literals below index positionally (`__cents[cell]`, `__cn2[cell]`,
    // `__d2[cell]`) — guard the density contract Ivf.train now guarantees
    // (empty Lloyd cells keep their previous centroid, never drop)
    require(centroids.map(_._1) == centroids.indices,
      s"IVF centroids must be dense 0..${centroids.size - 1}: " +
      centroids.map(_._1).mkString(","))
    val cents = centroids.map(_._2) // cell ids are 0..nCells-1, in order
    // residual corpus — assigned already carries the double vector `v`
    val resid = graft.Caching.materialize(
      residualFrame(assigned, cents, extraCols))
    val cb = Pq.train(resid, m, k, iters)
    (cb, centroids, resid, codeRows(resid, cb, cents, extraCols))
  }

  /** Train both halves and write the cell-partitioned code table:
    * `(vec_id, codes, rnorm)` under `cell=<c>/` directories. Codes
    * quantize the RESIDUAL `x − centroid(cell)`; `rnorm = |c_cell + r̂|`
    * expands to `|c|² + 2·(c·r̂) + |r̂|²`, all three terms m-lookup sums
    * into driver-literal tables (cell norms, cell×codebook cross-dots,
    * codebook norms) — still paid once at encode time, never per probe. */
  def buildIndex(emb: DataFrame, nCells: Int = 16, m: Int = 16, k: Int = 256,
                 iters: Int = 3, sessionLifetime: Boolean = false,
                 extraCols: Seq[String] = Seq.empty): IvfPqIndex = {
    val (cb, centroids, resid, rows) =
      trainArtifacts(emb, nCells, m, k, iters, extraCols)
    val dir =
      if (sessionLifetime) graft.TempDirs.createSessionLifetime("ivfpqindex_keep")
      else graft.TempDirs.create("ivfpqindex")
    rows.write.partitionBy("cell").mode("overwrite").parquet(dir)
    resid.unpersist()
    IvfPqIndex(cb, centroids, dir)
  }

  /** Residuals `x − centroid(cell)` of a cell-assigned prepared frame
    * (columns `vec_id, v, cell`), shaped as the `embedding` column
    * [[Pq]] consumes. */
  private[graft] def residualFrame(assigned: DataFrame,
                                        cents: Seq[Seq[Double]],
                                        extraCols: Seq[String] = Seq.empty): DataFrame =
    assigned.withColumn("__cents", typedLit(cents))
      .select(col("vec_id") +: col("cell") +:
        expr("transform(v, (x, i) -> x - __cents[cell][i])").as("embedding") +:
        extraCols.map(col): _*)

  /** `(vec_id, codes, rnorm, cell)` code rows of a residual frame under
    * GIVEN artifacts — the write-side projection, shared by
    * [[buildIndex]] and the incremental append path
    * ([[AnnIndexStore]]): `rnorm = |c_cell + r̂|` expands to
    * `|c|² + 2·(c·r̂) + |r̂|²`, all three terms m-lookup sums into
    * driver-literal tables, paid once at encode time. */
  private[graft] def codeRows(resid: DataFrame, cb: Pq.Codebooks,
                                   cents: Seq[Seq[Double]],
                                   extraCols: Seq[String] = Seq.empty): DataFrame = {
    val m = cb.size
    val d = cents.head.size
    val subd = d / m
    val cn2: Seq[Double] = cents.map(c => c.map(x => x * x).sum)
    val d2: Seq[Seq[Seq[Double]]] = cents.map { c =>       // [cell][j][code]
      (0 until m).map { j =>
        cb(j).map(r => (0 until subd).map(i => c(j * subd + i) * r(i)).sum)
      }
    }
    val rn2: Seq[Seq[Double]] = cb.map(_.map(r => r.map(x => x * x).sum))
    // rnorm through the native lookup expression — the three ADC tables
    // are expression metadata (one plan node), not array literals the
    // optimizer inlines into every reference; arithmetic order is
    // bit-identical to the old SQL chain (optimization r17, see
    // [[graft.functions.PqRnorm]])
    Pq.encode(resid, cb, extraCols = "cell" +: extraCols)
      .withColumn("rnorm", graft.functions.PqRnormFunction.pq_rnorm(
        resid.sparkSession, col("codes"), col("cell"), cn2, d2, rn2))
      .select(("vec_id" +: "codes" +: "rnorm" +: "cell" +: extraCols)
        .map(col): _*)
  }

  /** Code rows for NEW vectors under an EXISTING index's artifacts —
    * assign cells with the training pass's exact rule
    * ([[Ivf.assignExpr]] over the stored centroids), residual-encode
    * with the stored codebooks. O(new rows); the corpus is never
    * rescanned. */
  private[similarity] def encodeNewRows(newEmb: DataFrame, idx: IvfPqIndex,
      extraCols: Seq[String] = Seq.empty): DataFrame = {
    val cents = idx.centroids.sortBy(_._1).map(_._2)
    val assigned = Ivf.assignExpr(Cosine.prepared(newEmb, extraCols),
      idx.centroids)
    codeRows(residualFrame(assigned, cents, extraCols), idx.cb, cents,
      extraCols)
  }

  /** The index for `key`, building it on first use (train once, probe
    * many — the stored-artifact lifecycle, like [[Pq.indexFor]]). The
    * key carries the source files' content fingerprint so regenerated
    * testdata invalidates instead of serving stale codes. */
  def indexFor(emb: DataFrame, key: String, nCells: Int = 16, m: Int = 16,
               k: Int = 256, iters: Int = 3,
               extraCols: Seq[String] = Seq.empty): IvfPqIndex =
    indexStore.computeIfAbsent(
      s"$key|fp=${Pq.contentFingerprint(emb)}|c=$nCells|m=$m|k=$k|i=$iters" +
        s"|x=${extraCols.mkString(",")}",
      _ => buildIndex(emb, nCells, m, k, iters, sessionLifetime = true,
        extraCols = extraCols))

  /** IVF×PQ top-k: (1) per query, rank the IVF centroids on the driver
    * and keep the `nprobe` nearest cells; (2) ADC-scan ONLY those
    * cells' code partitions (partition-pruned read, ~16 B/row); (3)
    * exact re-rank of the per-query `shortlist` survivors. */
  def topK(emb: DataFrame, nQueries: Int, kNeighbors: Int,
           nCells: Int = 16, nprobe: Int = 10, m: Int = 16, k: Int = 256,
           iters: Int = 3, shortlist: Int = 50,
           indexKey: Option[String] = None): DataFrame = {
    val idx = indexKey match {
      case Some(key) => indexFor(emb, key, nCells, m, k, iters)
      case None => buildIndex(emb, nCells, m, k, iters)
    }
    probe(emb, idx, nQueries, kNeighbors, nprobe, shortlist)
  }

  /** The pure READ path over an already-built index (session-built or a
    * catalog load — [[AnnIndexStore]]); cell partition pruning applies
    * either way. */
  def probe(emb: DataFrame, idx: IvfPqIndex, nQueries: Int, kNeighbors: Int,
            nprobe: Int = 10, shortlist: Int = 50): DataFrame =
    probeImpl(emb, idx, nQueries, kNeighbors, nprobe, shortlist, None)

  /** PREDICATE-FILTERED top-k (round 16 — the retrieval/curation shape
    * every production vector stack serves: "nearest neighbors WITHIN
    * `source = 'web' AND quality > q`"): `filter` references attribute
    * columns stored IN the code table (pass them as `extraCols` at
    * build time — the Milvus/FAISS scalar-field discipline), and the
    * probe applies it to the code scan BEFORE ADC ranking:
    *
    *   - PRE-filtering, not post-: a post-filter of an unfiltered
    *     top-`shortlist` starves recall whenever the filter is
    *     selective (k matching survivors of 50 candidates ≈ k·sel);
    *     here every ADC-ranked candidate already matches, so the
    *     shortlist budget spends entirely inside the answer set;
    *   - the predicate lands in the SAME parquet scan as the cell
    *     pruning — directory-level `cell IN (probed…)` outside,
    *     pushed-down attribute filter inside (row-group stats + pages),
    *     still ~16 B/row over probed cells, zero extra passes;
    *   - BOTH probe knobs widen by the filter's measured selectivity
    *     (the FAISS discipline under selective filters): `nprobe` →
    *     `min(nCells, ⌈nprobe/sel⌉)` and `shortlist` →
    *     `min(16×, ⌈shortlist/sel⌉)`. A selective filter thins every
    *     cell's ELIGIBLE rows, so the true k-th filtered neighbor is
    *     farther — its cell is more often outside a fixed horizon, and
    *     no shortlist can recover a never-scanned cell (measured:
    *     min-recall collapsed with nprobe kept at 10 under a 0.3
    *     filter). The budget argument is exact: scanned rows ≈
    *     (nprobe/sel / nCells) · corpus · sel = the UNFILTERED probe's
    *     row budget — the filter pays for the extra cells, so recall
    *     is restored at the same ~16 B/row scan cost. Selectivity is
    *     measured once per call by a column-pruned count over the code
    *     table (the filter columns only — bytes/row of metadata, never
    *     the corpus; a production caller with a known selectivity can
    *     precompute and cache it).
    *
    * Queries come UNFILTERED from `emb` (any document may ask; the
    * predicate bounds the ANSWER set), and the exact re-rank runs over
    * the shortlist's already-filtered survivors. */
  def probeFiltered(emb: DataFrame, idx: IvfPqIndex, nQueries: Int,
                    kNeighbors: Int, filter: org.apache.spark.sql.Column,
                    nprobe: Int = 10, shortlist: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    val codes = Pq.codesFrame(spark, idx.codesPath)
    val total = codes.count() // footer metadata, no column read
    val kept =
      try codes.filter(filter).count() // filter columns only
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"ANN filter references columns the index does not carry " +
            s"(stored: ${codes.columns.mkString(", ")}) — build the index " +
            "with extraCols/attrCols including every filter column", e) }
    require(kept > 0, s"ANN filter matches no indexed row: $filter")
    val sel = kept.toDouble / math.max(1L, total)
    val widened = math.min(
      math.max(shortlist, math.ceil(shortlist / sel).toInt),
      shortlist * 16)
    val probeWide = math.min(idx.centroids.size,
      math.max(nprobe, math.ceil(nprobe / sel).toInt))
    probeImpl(emb, idx, nQueries, kNeighbors, probeWide, widened, Some(filter))
  }

  private def probeImpl(emb: DataFrame, idx: IvfPqIndex, nQueries: Int,
                        kNeighbors: Int, nprobe: Int, shortlist: Int,
                        candidateFilter: Option[org.apache.spark.sql.Column])
      : DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = idx.cb.size
    val qRows = Pq.collectQueries(emb, nQueries)
    // driver-side probe selection against the centroid metadata — the
    // same cosine-distance ranking Ivf's probe projection computes
    def nearestCells(v: Seq[Double]): Seq[Int] = {
      val vn = math.sqrt(v.map(x => x * x).sum)
      idx.centroids.map { case (cell, c) =>
        val cn = math.sqrt(c.map(x => x * x).sum)
        val dot = v.indices.map(i => v(i) * c(i)).sum
        (1.0 - dot / (vn * cn), cell)
      }.sorted.take(nprobe).map(_._2)
    }
    // one (query, cell, lut, qnorm, q·c_cell) row per probed cell: the
    // equi-join below replicates each scanned code row only to the
    // queries that probed its cell; __off is the residual-decomposition
    // offset (q·x̂ = q·c_cell + Σ lut lookups)
    val cellCentroid = idx.centroids.toMap
    val probeRows = qRows.toSeq.flatMap { r =>
      val v = r.getSeq[Double](1)
      val lut = Pq.adcLut(idx.cb, v)
      nearestCells(v).map { c =>
        val cent = cellCentroid(c)
        val off = v.indices.map(i => v(i) * cent(i)).sum
        (r.getLong(0), c, lut, r.getDouble(2), off)
      }
    }
    val probes = broadcast(
      probeRows.toDF("query_id", "cell", "__lut", "__qnorm", "__off"))
    val allProbed = probeRows.map(_._2).distinct
    // cell IN (...) is partition pruning on the cell-partitioned layout:
    // non-probed cells' files are never opened; the attribute filter
    // (if any) rides the SAME scan, applied before the probe join so
    // ADC only ever ranks matching candidates
    val scored = candidateFilter
      .foldLeft(Pq.codesFrame(spark, idx.codesPath)
        .filter(col("cell").isin(allProbed: _*)))((df, f) => df.filter(f))
      .join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Pq.adcSimOffset(m).as("pqsim"))
    Pq.refineExact(emb, Pq.adcShortlist(scored, shortlist), qRows, kNeighbors)
  }
}
