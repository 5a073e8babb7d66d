package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded-cardinality element stream,
  * count-min-sketch prefiltered — the boilerplate/template detector of
  * LLM data pipelines ("which n-grams appear often enough to be
  * markup, license headers, or scaffolding?").
  *
  * The naive plan — `groupBy(elem).count().filter(n >= T)` — shuffles
  * the ENTIRE distinct-element table to answer a question whose output
  * is at most N/T rows; at 100 TB the n-gram vocabulary is itself
  * terabytes, so that shuffle is the job. This operator never shuffles
  * the vocabulary:
  *
  *  1. ONE pass builds a count-min sketch as a DataFrame aggregate: each
  *     occurrence lands in `depth` cells (xxhash64 seeded per row, mod
  *     `width`), so the groupBy key space is ≤ depth·width cells —
  *     constant-size state, map-side partials, a shuffle of sketch
  *     partials only.
  *  2. The threshold derives from the sketch itself (Σ of any one row's
  *     cells = N exactly — every occurrence hits exactly one cell per
  *     row), so no separate count pass.
  *  3. A SECOND pass re-hashes each occurrence and looks its `depth`
  *     cells up via broadcast joins against the (tiny) sketch — a
  *     MAP-SIDE filter: only occurrences whose min-cell estimate clears
  *     the threshold survive to the exact groupBy, whose shuffle now
  *     carries candidate occurrences only (≤ depth·N/width collisions +
  *     true heavy mass, never the vocabulary).
  *  4. The exact count re-filter drops sketch false positives.
  *
  * EXACTNESS is unconditional: count-min estimates never undercount
  * (est ≥ true for every element, deterministically — collisions only
  * add), so step 3 can never drop a true heavy hitter and step 4 leaves
  * precisely `{elem : count(elem) ≥ T}` with exact counts. Sketch
  * accuracy only moves the candidate-set size, never the answer —
  * the same bucket-moves-work-not-results law as the interval join.
  */
object Boilerplate {

  /** Heavy hitters of the single-column frame `elems` (column `elem`):
    * all elements with count ≥ max(minThreshold, N div fraction), exact
    * counts, ordered (n desc, elem). */
  def heavyHitters(elems: DataFrame, width: Int = 8192, depth: Int = 4,
                   minThreshold: Long = 10L, fraction: Long = 800L): DataFrame = {
    require(elems.columns.contains("elem"), "heavyHitters expects an 'elem' column")
    val e = elems.select("elem")
    val cells = graft.Caching.materialize(
      e.select(posexplode(array((0 until depth).map(d =>
          pmod(xxhash64(col("elem"), lit(d)), lit(width))): _*)).as(Seq("r", "cell")))
        .groupBy("r", "cell").agg(count(lit(1)).as("c")))
    val thr = cells.filter(col("r") === 0).agg(sum(col("c")).as("s"))
      .select(greatest(lit(minThreshold), expr(s"s div $fraction")).as("thr"))
    val withEst = (0 until depth).foldLeft(e.crossJoin(broadcast(thr))) { (acc, d) =>
      val sk = cells.filter(col("r") === d)
        .select(col("cell").as(s"cell_$d"), col("c").as(s"c_$d"))
      acc.withColumn(s"cell_$d", pmod(xxhash64(col("elem"), lit(d)), lit(width)))
        .join(broadcast(sk), Seq(s"cell_$d"))
    }
    withEst
      .filter(least((0 until depth).map(d => col(s"c_$d")): _*) >= col("thr"))
      .groupBy("elem", "thr").agg(count(lit(1)).as("n"))
      .filter(col("n") >= col("thr"))
      .select(col("elem"), col("n"))
      .orderBy(col("n").desc, col("elem"))
  }
}
