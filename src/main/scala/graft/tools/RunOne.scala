package graft.tools

/** Run one registry query and print its rows — for eyeballing pinned
  * booleans at scale factors the oracle does not cover (e.g. the sf10
  * boundedness row of sql_optimize_partition).
  * Usage: RunOne <query>; env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS. */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunOne <query>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("run-one", s"local[$cpus]",
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.ensureBucketedTables(spark, sfDir)
    graft.SparkEntry.drainTempDirs()
    graft.SparkEntry.queries(args(0))(spark, sfDir).show(100, false)
    graft.SparkEntry.cleanupTempDirs()
    spark.stop()
  }
}
