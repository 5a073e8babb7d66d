package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic train/test splitting for training-data pipelines.
  *
  * `randomSplit` depends on partition layout and sampling state; a hash
  * split depends only on the key value, so the same document lands in the
  * same split across runs, machines, and corpus versions — the property
  * that keeps eval sets uncontaminated as the corpus grows.
  */
object Splits {

  /** (train, test) with ~testPermille/1000 of rows in test, assigned by
    * xxhash64(key) — stable under repartitioning and appends. */
  def hashSplit(df: DataFrame, keyCol: String, testPermille: Int): (DataFrame, DataFrame) = {
    require(testPermille > 0 && testPermille < 1000)
    val bucket = pmod(xxhash64(col(keyCol)), lit(1000))
    (df.filter(bucket >= testPermille), df.filter(bucket < testPermille))
  }

  /** EXACT-quota stratified sample: within each stratum keep the
    * `ceil(fracPermille/1000 × stratum_size)` rows with the smallest
    * (xxhash64(key), key) — deterministic under repartitioning, and the
    * per-stratum sample size is exact by construction (the quota is
    * integer arithmetic, `(n × f + 999) div 1000`, so both engines of
    * the oracle compute the identical number — no float ceil drift).
    *
    * Cost is one shuffle on the stratum key plus an in-partition sort
    * (rank + count ride the same window). At 100 TB with FEW strata
    * that shuffle concentrates; when approximate fractions suffice,
    * prefer the quota-free [[hashSplit]] rule per stratum — zero
    * shuffle, binomial error — and reserve quota-exact sampling for
    * eval-set construction where exactness is the point. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fracPermille: Int): DataFrame = {
    require(fracPermille > 0 && fracPermille <= 1000)
    val byStratum = org.apache.spark.sql.expressions.Window.partitionBy(strataCol)
    val w = byStratum.orderBy(xxhash64(col(keyCol)), col(keyCol))
    // rank and count ride the SAME window shuffle; the quota stays in
    // the Column API except the integral `div` (applied to our own
    // internal column, so arbitrary caller column names never reach a
    // SQL string)
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(byStratum))
      .withColumn("__quota", expr(s"(__cnt * $fracPermille + 999) div 1000"))
      .filter(col("__rk") <= col("__quota"))
      .drop("__rk", "__cnt", "__quota")
  }
}
