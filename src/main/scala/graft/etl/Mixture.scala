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
