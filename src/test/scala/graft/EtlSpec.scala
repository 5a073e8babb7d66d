package graft

import org.apache.spark.sql.functions._

import graft.etl._

class EtlSpec extends SparkSpec {

  test("consumer pipeline unifies fleets, applies DQ, adds features") {
    val c = ConsumerPipeline.consumer(spark, sf).cache()
    assert(c.count() > 0)
    // only the two mapped fleets survive
    val types = c.select("trip_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set(ConsumerPipeline.YellowType, ConsumerPipeline.GreenType))
    // DQ: no nulls / non-positives
    assert(c.filter(col("passenger_count") <= 0 || col("total_amount") < 0 ||
      col("pickup_datetime").isNull).count() == 0)
    // features present and sane
    assert(c.filter(col("trip_year") =!= 2024 || col("trip_month") =!= 1).count() == 0)
    c.unpersist()
  }

  test("schema unification coalesces divergent timestamp columns") {
    val u = ConsumerPipeline.unified(spark, sf)
    assert(u.filter(col("pickup_datetime").isNull).count() == 0)
    // yellow rows carry tpep, green rows carry lpep — never both
    assert(u.filter(col("tpep_pickup_datetime").isNotNull &&
      col("lpep_pickup_datetime").isNotNull).count() == 0)
  }

  test("DQ audit counts violations in one pass") {
    val ev = Tables.events(spark, sf)
    val rules = Seq(DqRule.Positive("user_id"), DqRule.NonNegative("value"))
    val row = DataQuality.audit(ev, rules).collect()(0)
    val total = row.getAs[Long]("rows_total")
    assert(total == ev.count())
    val cleanCount = DataQuality.clean(ev, rules).count()
    // violations of rule 0 (user_id <= 0) must equal total - |user_id>0|
    assert(row.getAs[Long]("viol_0") == total - ev.filter(col("user_id") > 0).count())
    assert(cleanCount <= total)
  }

  test("all registered queries return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
