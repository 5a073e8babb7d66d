package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; Spark
  * getOrCreate dedupes across suites). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("graft-test", "local[4]", shufflePartitions = 4).getOrCreate()
  lazy val sf: String = "/root/testdata/sf0.001"
}
