package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-shaped semantic redundancy pruning (Abbas et al. 2023's
  * regime): remove documents whose EMBEDDINGS nearly coincide — texts
  * that say the same thing in different words, which no textual dedup
  * (hash, shingle, simhash) can see. The curation step sits after
  * textual dedup in a pretraining pipeline; measured on web corpora it
  * removes several percent of semantically redundant mass.
  *
  * Algorithm, composed from the two scale disciplines this library
  * already carries:
  *  1. CANONICALIZE byte-identical vectors (the round-10 rule): one
  *     row per distinct vector value; identical copies are semantic
  *     duplicates by definition and never enter the pairwise stage —
  *     on a replicated corpus the quadratic term collapses before any
  *     search begins.
  *  2. CELL-PARTITION the distinct vectors with the [[Ivf]] k-means
  *     cells (SemDeDup's clustering step) — pairwise work happens only
  *     WITHIN a cell, never across, so cost is Σ|cell|² over distinct
  *     values instead of n².
  *  3. Within each cell, a vector is DROPPED iff some same-cell vector
  *     with a SMALLER id has cosine ≥ τ with it (the deterministic
  *     keep-one rule: min-id representative survives; no iterative
  *     connected components, no order dependence).
  *  4. Expand classes back: a dominated canonical drops ALL its
  *     members; a surviving canonical keeps exactly its min-id member
  *     and drops the rest (identical copies).
  *
  * The candidate join carries `(cid, cell)` only — vectors are fetched
  * back by id for the verify, the [[Cosine.nearDupPairsAnn]] shuffle
  * discipline. Pairwise cosine is the fixed-width codegen expression
  * ([[graft.functions.GraftFunctions.cosine_sim]]), never an
  * interpreted HOF lambda. */
object SemDedup {

  /** `(vec_id, dropped)` for every input row, plus the class/cell
    * bookkeeping — the row-level face. */
  def flags(emb: DataFrame, nCells: Int = 16, tau: Double = 0.9,
            iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    // full assignment: identical vectors land in identical cells
    // (argmin over the same centroid literals, deterministic tie-break)
    val assigned = Ivf.index(emb, nCells, iters)
    val classes = graft.Caching.materialize(
      assigned.groupBy(col("v"))
        .agg(min(col("vec_id")).as("cid"), first(col("cell")).as("cell"),
             collect_list(col("vec_id")).as("members")))
    // within-cell candidate pairs over (cid, cell) ONLY; vectors join
    // back by id. Repartition by cell so the pair join fans out instead
    // of inheriting a 1-2 split layout (the parallelism-collapse fix).
    val slim = classes.select(col("cid"), col("cell"))
      .repartition(col("cell"))
    val cand = slim.as("a")
      .join(slim.select(col("cid").as("cid_b"), col("cell")).as("b"), Seq("cell"))
      .filter(col("cid") < col("cid_b"))
    val va = classes.select(col("cid"), col("v").as("v_a"))
    val vb = classes.select(col("cid").as("cid_b"), col("v").as("v_b"))
    val dominated = cand.join(va, Seq("cid")).join(vb, Seq("cid_b"))
      .filter(graft.functions.GraftFunctions
        .cosine_sim(spark, col("v_a"), col("v_b")) >= tau)
      .select(col("cid_b").as("cid")).distinct()
      .withColumn("__dom", lit(true))
    classes.join(dominated, Seq("cid"), "left")
      .select(col("cid"), col("cell"),
        coalesce(col("__dom"), lit(false)).as("class_dominated"),
        explode(col("members")).as("vec_id"))
      .withColumn("dropped",
        col("class_dominated") || col("vec_id") =!= col("cid"))
      .select("vec_id", "cid", "cell", "class_dominated", "dropped")
  }

  /** Corpus census: `(n_total, n_dropped, dropped_xor, n_kept)` — the
    * bit_xor fingerprint pins the EXACT dropped membership. */
  def report(emb: DataFrame, nCells: Int = 16, tau: Double = 0.9,
             iters: Int = 3): DataFrame =
    flags(emb, nCells, tau, iters).agg(
      count(lit(1)).as("n_total"),
      count(when(col("dropped"), lit(1))).as("n_dropped"),
      coalesce(expr("bit_xor(CASE WHEN dropped THEN vec_id END)"), lit(0L))
        .as("dropped_xor"),
      count(when(!col("dropped"), lit(1))).as("n_kept"))
}
