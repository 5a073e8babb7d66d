package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Schema normalization and unification across heterogeneous inputs.
  *
  * The reference's yellow/green feeds carry disjoint column sets
  * (`tpep_*` vs `lpep_*`); it completes each schema with typed NULLs,
  * renames vendor columns, and coalesces the variants into unified
  * columns (process_data_glue.py:44-57,158-174). These helpers express
  * the same semantics as pure metadata / projection operations — zero
  * shuffle, fully codegen'd.
  */
object SchemaUnify {

  /** Add any missing columns as typed NULL literals (no-op when present).
    * Ref: process_data_glue.py:162-174. */
  def withMissingColumns(df: DataFrame, columns: Map[String, DataType]): DataFrame =
    columns.foldLeft(df) { case (d, (name, dt)) =>
      if (d.columns.contains(name)) d
      else d.withColumn(name, lit(null).cast(dt))
    }

  /** Bulk rename, skipping absent sources. Ref: VendorID → vendor_id. */
  def normalizeNames(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** Unified column = first non-null among candidates (absent ones are
    * ignored). Ref: coalesce(tpep_pickup_datetime, lpep_pickup_datetime). */
  def coalesceInto(df: DataFrame, target: String, candidates: Seq[String]): DataFrame = {
    val present = candidates.filter(df.columns.contains)
    require(present.nonEmpty, s"none of $candidates present")
    df.withColumn(target, coalesce(present.map(col): _*))
  }

  /** Union heterogeneous frames by column name, padding missing columns
    * with NULLs. Ref: reporting_etl_job.py:128 unionByName(allowMissing). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionAll of zero frames")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
