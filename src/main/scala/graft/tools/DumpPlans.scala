package graft.tools

import java.io.{File, FileWriter}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan-evidence capture for the optimization round: runs registry
  * queries under a QueryExecutionListener and appends the FORMATTED
  * physical plan of EVERY executed action (the scenario's internal
  * commits included — where the engine-kernel work actually happens,
  * invisible in the returned frame's own plan) to one file per query.
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <suffix> <q1>[,<q2>..]
  * Writes <outDir>/<query>_<suffix>.txt
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <suffix> <queries>")
    val outDir = new File(args(0)); outDir.mkdirs()
    val suffix = args(1)
    val names = args.drop(2).flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.ensureBucketedTables(spark, sfDir)
    graft.SparkEntry.drainTempDirs()

    @volatile var sink: Option[FileWriter] = None
    val listener = new QueryExecutionListener {
      private def dump(funcName: String, qe: QueryExecution): Unit =
        sink.foreach { w =>
          w.synchronized {
            w.write(s"\n===== action: $funcName =====\n")
            // formatted mode: operator list + details (PushedFilters,
            // ReadSchema, join strategies, exchange modes)
            w.write(qe.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            w.flush()
          }
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = dump(funcName, qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = dump(funcName, qe)
    }
    spark.listenerManager.register(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val f = new File(outDir, s"${name}_$suffix.txt")
      val w = new FileWriter(f)
      w.write(s"# $name — every executed plan of one scenario run ($suffix)\n")
      sink = Some(w)
      try {
        val df = fn(spark, sfDir)
        w.write("\n===== RETURNED FRAME (declared query output) =====\n")
        w.write(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        df.write.format("noop").mode("overwrite").save()
      } finally {
        sink = None
        // give straggling listener callbacks a beat before closing
        Thread.sleep(300)
        w.close()
      }
      graft.SparkEntry.cleanupTempDirs()
      spark.catalog.clearCache()
      println(s"wrote ${f.getPath}")
    }
    spark.stop()
  }
}
