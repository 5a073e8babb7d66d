package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: registers every test table as a temp view (events with
  * its timestamp already normalized), so users get the reference's
  * Athena/Glue-Catalog experience — ad-hoc `spark.sql` over named
  * tables — without a metastore. On a cluster these would be catalog
  * tables (saveAsTable / Hive metastore / Unity-style catalog); the query
  * surface is identical.
  */
object Catalog {
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    Tables.all.foreach { name =>
      val df =
        if (name == "events") Tables.events(spark, sfDir)
        else Tables.load(spark, sfDir, name)
      df.createOrReplaceTempView(name)
    }
}
