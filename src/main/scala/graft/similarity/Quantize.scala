package graft.similarity

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding stores — the standard storage
  * lever at 100 TB: a float64/float32 embedding column shrinks ~8×/4×
  * (one byte per dimension + two scalars per vector), the ANN scan reads
  * an eighth of the bytes, and cosine ranking is barely perturbed
  * (per-element error ≤ scale/2 with scale = range/255).
  *
  * Everything here is higher-order array functions over the codes
  * column — `transform`/`array_min`/`array_max` are codegen'd
  * expressions, so quantize and dequantize both ride whole-stage
  * codegen with no UDF. Per-VECTOR min/max (not per-corpus) keeps the
  * scheme shift/scale-invariant per row and needs no training pass.
  *
  * Degenerate constant vectors (range 0) quantize to all-zero codes and
  * dequantize to the constant — handled, not special-cased downstream. */
object Quantize {

  /** (vec_id, qmin, qscale, codes: array<tinyint>) — codes in -128..127
    * encode round((x - qmin) / qscale) - 128. */
  def quantized(emb: DataFrame): DataFrame =
    emb
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("qmin", expr("array_min(v)"))
      .withColumn("qscale", (expr("array_max(v)") - col("qmin")) / lit(255.0))
      .withColumn("codes", expr(
        """transform(v, x -> cast(round(
          |  CASE WHEN qscale = 0.0d THEN 0.0d ELSE (x - qmin) / qscale END
          |) - 128 as tinyint))""".stripMargin))
      .select("vec_id", "qmin", "qscale", "codes")

  /** Reconstructed vector from quantized form (array<double>). */
  def dequantized(qz: DataFrame): DataFrame =
    qz.withColumn("dq", expr(
      "transform(codes, c -> qmin + (cast(c as double) + 128.0d) * qscale)"))

  /** One-scan per-vector sidecar for the quantized all-pairs pre-filter
    * ([[Cosine.nearDupPairs]]): the int8 codes plus every per-vector
    * scalar the O(n²) pair stage needs, so that stage never touches a
    * double array —
    *   - `s_lvl`: sum of unsigned levels `code+128`, which reconstructs
    *     the cross terms of the dequantized dot algebraically
    *     (`dot(dq_a, dq_b) = d·qmin_a·qmin_b + qmin_a·qscale_b·s_b +
    *     qmin_b·qscale_a·s_a + qscale_a·qscale_b·quant_dot(codes)`),
    *   - `qnorm`: `||dq||` exactly, for the quantized cosine,
    *   - `delta`: `||dq - v|| / ||v||` — the EXACT per-vector relative
    *     quantization error (not the worst-case `scale/2·sqrt(d)` bound),
    *     which makes the rigorous candidate margin tight,
    *   - `v`, `norm`: for the exact verify stage (projected away before
    *     block replication; only survivors read them back).
    * All HOFs run once per VECTOR (O(n) rows), never per pair. */
  def pairPrepared(emb: DataFrame): DataFrame =
    emb
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("qmin", expr("array_min(v)"))
      .withColumn("qscale", (expr("array_max(v)") - col("qmin")) / lit(255.0))
      .withColumn("codes", expr(
        """transform(v, x -> cast(round(
          |  CASE WHEN qscale = 0.0d THEN 0.0d ELSE (x - qmin) / qscale END
          |) - 128 as tinyint))""".stripMargin))
      .withColumn("dq", expr(
        "transform(codes, c -> qmin + (cast(c as double) + 128.0d) * qscale)"))
      .withColumn("s_lvl", expr(
        "cast(aggregate(codes, 0L, (acc, c) -> acc + cast(c as bigint) + 128L) as double)"))
      .withColumn("qnorm", expr(
        "sqrt(aggregate(dq, cast(0 as double), (acc, x) -> acc + x * x))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(v, cast(0 as double), (acc, x) -> acc + x * x))"))
      .withColumn("delta", expr(
        """CASE WHEN norm = 0.0d THEN cast(null as double) ELSE
          |  sqrt(aggregate(zip_with(dq, v, (a, b) -> (a - b) * (a - b)),
          |       cast(0 as double), (acc, x) -> acc + x)) / norm END""".stripMargin))
      .select("vec_id", "v", "norm", "codes", "qmin", "qscale",
              "s_lvl", "qnorm", "delta")

  /** Brute-force cosine top-k with EXACT queries against the QUANTIZED
    * corpus — the production read path: queries are few (exact is free),
    * the corpus is the 100 TB side (quantized scan reads ~1/8 of the
    * bytes). Same broadcast-queries/one-corpus-scan shape as
    * [[Cosine.bruteTopK]]. */
  def topK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    val corpus = dequantized(quantized(emb)).select("vec_id", "dq")
    val q = Cosine.prepared(emb).filter(col("vec_id") < nQueries)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rawsim").desc, col("neighbor_id"))
    corpus.as("c").join(broadcast(q.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        graft.functions.GraftFunctions.cosine_sim(spark, col("q.v"), col("c.dq"))
          .as("rawsim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("rawsim"), 4).as("sim"))
      .orderBy("query_id", "rank")
  }
}
