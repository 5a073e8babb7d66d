package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the skewed (large) side's key
  * space `saltFactor`-ways and replicate the small side across all salt
  * values, so one hot key fans out over `saltFactor` reducers instead of
  * pinning a single task.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when a single KEY (not partition) is hot —
  * AQE cannot split one key's hash bucket across tasks for a sort-merge
  * join's grouped iteration. Result is provably identical to the plain
  * equi-join (spec-checked).
  */
object Salting {

  /** Equi-join `large ⋈ small` on `keys`, salted `saltFactor`-ways.
    * The salt on the large side is derived from xxhash64 of the whole row
    * (deterministic given row content; any per-row value works — the join
    * result is salt-invariant). */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                     saltFactor: Int = 8): DataFrame = {
    val allCols = large.columns.map(col).toSeq
    val salted = large.withColumn("_salt",
      pmod(xxhash64(allCols: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
