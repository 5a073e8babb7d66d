package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-weighted mixture sampling — the data-recipe step between a
  * raw corpus and a training run: given a target TOKEN-share weight per
  * source domain (web 6 : code 2 : books 2 …), downsample the
  * overrepresented domains so the realized token counts sit in the
  * target proportions, without ever upsampling (no doc repeats) and
  * without ever splitting a document.
  *
  * The mixture scale is set by the BINDING domain — the one whose full
  * inventory runs out first at its weight: `S = min_s floor(tokens_s /
  * w_s)`, `target_s = S × w_s`. All integer arithmetic, so both engines
  * of the oracle compute identical targets (no float-share drift).
  * Within a domain, docs are taken in a deterministic hash order
  * (smallest first) while they FIT: a doc is kept iff its running token
  * sum through itself stays ≤ target — realized tokens never exceed the
  * target, membership is a pure function of the corpus, and appends or
  * repartitioning cannot reshuffle who is in.
  *
  * Scale shape: one O(sources) aggregate (collected — bounded driver
  * metadata, sources are a handful of domains at any corpus size), one
  * broadcast of the targets, and ONE shuffle: the per-source window
  * cumsum. Nothing is O(corpus) on the driver and no pairwise work
  * exists anywhere.
  *
  * `orderCol` picks the deterministic permutation. Production default is
  * `xxhash64(doc_id)`; the registry query passes the portable LCG
  * `(doc_id × 1103515245 + 12345) mod 2^31` instead, which DuckDB
  * evaluates bit-identically — so the oracle pins EXACT membership
  * (bit_xor over kept ids), not just quota counts. */
object Mixture {

  /** Portable deterministic permutation both engines compute identically
    * in 64-bit integer arithmetic (doc_id ≥ 0 keeps `%` = `pmod`). */
  def lcgOrder(id: Column): Column =
    (id * lit(1103515245L) + lit(12345L)) % lit(2147483648L)

  /** Kept rows of `docs` under the weighted token mixture, with the
    * per-row bookkeeping columns (`__tk` tokens, `__w` weight,
    * `__target` domain token target, `__cum` running sum through this
    * row). `weightOf` maps the source column to an integer weight ≥ 1. */
  def sampleByTokenShare(docs: DataFrame, sourceCol: String,
                         weightOf: Column => Column,
                         orderCol: Column => Column): DataFrame = {
    val spark = docs.sparkSession
    val tk = docs
      .withColumn("__tk", size(graft.text.TextOps.tokenize(col("text"))).cast("long"))
      .withColumn("__w", weightOf(col(sourceCol)).cast("long"))
    // O(sources) inventory: the only driver-side state, bounded by the
    // domain count (a handful at any corpus scale)
    val inv = tk.groupBy(col(sourceCol)).agg(
        first(col("__w")).as("__w"), sum(col("__tk")).as("__inv")).collect()
    require(inv.forall(_.getLong(1) >= 1), "mixture weights must be >= 1")
    val scale = inv.map(r => r.getLong(2) / r.getLong(1)).min
    val targets = spark.createDataFrame(
        spark.sparkContext.parallelize(inv.toSeq.map(r =>
          (r.getString(0), r.getLong(1) * scale)), 1))
      .toDF(sourceCol, "__target")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(orderCol(col("doc_id")), col("doc_id"))
    tk.join(broadcast(targets), sourceCol)
      .withColumn("__cum", sum(col("__tk")).over(w))
      .filter(col("__cum") <= col("__target"))
  }

  /** IMPORTANCE (quality-weighted Poisson) sampling — the other half of
    * the curation-sampling family: where [[sampleByTokenShare]] hits
    * per-DOMAIN token quotas, this keeps each document INDEPENDENTLY
    * with probability proportional to its quality score — the
    * "sample the good stuff harder" recipe step pretraining mixes use
    * between hard filtering (loses borderline mass entirely) and
    * uniform sampling (pays for junk at the same rate as prose).
    *
    * Deterministic and engine-portable by construction: the coin is the
    * portable LCG over doc_id ([[lcgOrder]] — both engines compute the
    * identical permutation), the weight is the shared quality score
    * (rounded at its output edge, so both engines hold the same
    * double), and the keep test `lcg(id) % 1e6 < floor(q · rateScale)`
    * is integer-vs-integer — no float-boundary drift anywhere, which is
    * what lets the oracle pin EXACT membership (bit_xor fingerprint),
    * not just sample sizes. A pure per-row projection + filter: no
    * shuffle, no RNG state, trivially reproducible at any scale —
    * re-running the pipeline keeps the same documents.
    *
    * `rateScale`/1e6 is the keep probability of a perfect-quality doc
    * (default 0.5); a doc's expected keep rate is `q/2`. */
  def importanceSample(docs: DataFrame, textCol: String = "text",
                       rateScale: Long = 500000L): DataFrame =
    graft.text.TextOps.qualityScore(docs, textCol)
      .filter(pmod(lcgOrder(col("doc_id")), lit(1000000L)) <
              floor(col("quality_score") * rateScale.toDouble))

  /** Per-source importance-sampling census: inventory, kept docs/tokens,
    * the exact-membership fingerprint, and the realized rate (which
    * tracks the source's mean quality — the probe that the sampling is
    * actually quality-weighted, not uniform). */
  def importanceReport(docs: DataFrame, sourceCol: String): DataFrame = {
    val kept = importanceSample(docs)
      .groupBy(col(sourceCol)).agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("kept_tokens"),
        expr("bit_xor(doc_id)").as("kept_xor"))
    docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("kept_xor"), lit(0L)).as("kept_xor"),
        round(coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_docs"), 4)
          .as("eff_rate"))
      .orderBy(sourceCol)
  }

  /** Per-domain mixture report: weight, inventory, integer token target,
    * kept docs/tokens, and a bit_xor membership fingerprint over the
    * kept doc_ids — one row per source, but every doc's keep/drop
    * decision feeds the fingerprint, so the oracle comparison pins the
    * exact sample, not just its size. */
  def mixtureReport(docs: DataFrame, sourceCol: String,
                    weightOf: Column => Column,
                    orderCol: Column => Column): DataFrame = {
    val kept = sampleByTokenShare(docs, sourceCol, weightOf, orderCol)
    kept.groupBy(col(sourceCol)).agg(
        first(col("__w")).as("weight"),
        first(col("__target")).as("target_tokens"),
        count(lit(1)).as("n_docs"),
        sum(col("__tk")).as("kept_tokens"),
        expr("bit_xor(doc_id)").as("member_xor"))
      .orderBy(sourceCol)
  }
}
