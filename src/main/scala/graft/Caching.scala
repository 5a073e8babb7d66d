package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Central gate for every materialization this library performs.
  *
  * An unconditional `.cache()` of a full fact table is a memory-pressure
  * footgun at 100 TB: MEMORY_ONLY evicts under pressure (recompute storms)
  * or OOMs executors. Two mitigations, both here:
  *   - storage level is MEMORY_AND_DISK — overflow spills instead of
  *     evicting or failing;
  *   - callers can turn materialization off entirely with
  *     `spark.conf.set("graft.materialize", "false")` (e.g. when the
  *     signature/consumer layer is already a persisted table, which is the
  *     production shape — the in-memory cache is the small-scale analogue
  *     of that materialized layer, not a requirement).
  */
object Caching {
  val MaterializeKey = "graft.materialize"

  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(MaterializeKey, "true").toBoolean)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    else df
}
