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
}
