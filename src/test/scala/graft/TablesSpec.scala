package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins the testdata schema CONTRACT at the reader boundary: whatever
  * physical encoding a testdata regeneration picks for `events.ts`,
  * `Tables.events` / `Tables.normalizeTs` must surface `ts` as a µs
  * `TimestampType` with identical values, and the strict-typed consumers
  * that broke in round 6 (`unix_micros`, `withWatermark`, the typed
  * `java.sql.Timestamp` encoder) must all resolve on the result.
  *
  * Three encodings have actually shipped:
  *  - TIMESTAMP(NANOS): under `spark.sql.legacy.parquet.nanosAsLong=true`
  *    the scan surfaces a LongType of nanos (emulated here by writing the
  *    long directly — Spark cannot author nanos parquet, but the engine
  *    only ever sees the post-scan LongType either way);
  *  - timestamp[us] NTZ (isAdjustedToUTC=false) — the round-6 regen;
  *    Spark 4 reads it as TimestampNTZType;
  *  - timestamp[us] UTC — plain TimestampType.
  *
  * Reference analogue: process_data_glue.py:158-174 completes schemas
  * column-wise before the union; this spec applies the same discipline to
  * the time TYPE, which that pipeline never had to defend because Glue
  * controlled both writer and reader.
  */
class TablesSpec extends SparkSpec {

  // one instant with a non-zero microsecond component, expressed in µs
  private val baseUs = 1700000000123456L
  private val instants = Seq(baseUs, baseUs + 1L, baseUs + 59L * 1000000L)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tables").toString

  /** Write events-shaped parquet with ts in the given encoding, read it
    * back, and return the raw (un-normalized) frame. */
  private def writeRead(encoding: String): DataFrame = {
    import spark.implicits._
    val dir = tmp()
    val df = encoding match {
      case "nanos-long" =>
        instants.zipWithIndex
          .map { case (us, i) => (i.toLong, us * 1000L) }
          .toDF("user_id", "ts")
      case "micros-ntz" =>
        instants.zipWithIndex
          .map { case (us, i) => (i.toLong, us) }
          .toDF("user_id", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
          .select("user_id", "ts")
      case "micros-utc" =>
        instants.zipWithIndex
          .map { case (us, i) => (i.toLong, us) }
          .toDF("user_id", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .select("user_id", "ts")
    }
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private val encodings = Seq("nanos-long", "micros-ntz", "micros-utc")

  test("raw reads surface the three distinct physical types") {
    val types = encodings.map(e => e -> writeRead(e).schema("ts").dataType).toMap
    assert(types("nanos-long") == LongType)
    assert(types("micros-ntz") == TimestampNTZType)
    assert(types("micros-utc") == TimestampType)
  }

  test("normalizeTs yields TimestampType with identical µs values for every encoding") {
    val normalized = encodings.map { e =>
      e -> Tables.normalizeTs(writeRead(e), "ts")
    }
    normalized.foreach { case (e, df) =>
      assert(df.schema("ts").dataType == TimestampType,
        s"$e: expected TimestampType, got ${df.schema("ts").dataType}")
    }
    // value-preservation: the UTC session makes all three encodings read
    // back to the same epoch-µs values
    val us = normalized.map { case (e, df) =>
      e -> df.select(unix_micros(col("ts"))).as[Long](spark.implicits.newLongEncoder)
        .collect().sorted.toSeq
    }.toMap
    assert(us("nanos-long") == instants.sorted)
    assert(us("micros-ntz") == instants.sorted)
    assert(us("micros-utc") == instants.sorted)
  }

  test("strict TimestampType consumers resolve on every normalized encoding") {
    import spark.implicits._
    encodings.foreach { e =>
      val df = Tables.normalizeTs(writeRead(e), "ts")
      // unix_micros: DATATYPE_MISMATCH on NTZ (broke window_sessionize /
      // events_funnel in round 6)
      assert(df.select(unix_micros(col("ts"))).count() == instants.size)
      // withWatermark: EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ (broke
      // stream_static_join). Resolution is eager — analysis suffices.
      df.withWatermark("ts", "1 hour").queryExecution.analyzed
      // typed encoder + row accessor: ClassCastException on LocalDateTime
      // under NTZ (broke stream_sessionize)
      val typed = df.select(col("user_id"), col("ts"))
        .as[streaming.EventsStream.SessionEvent]
      assert(typed.collect().map(_.ts).nonEmpty)
      val row = df.agg(max(col("ts"))).collect()(0)
      assert(row.getTimestamp(0) != null)
    }
  }

  test("Tables.events on the shipped testdata honors the contract end-to-end") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).limit(1).count() == 1)
  }

  test("embeddings contract: float and double parquet score identically") {
    // the same regen hazard as events.ts, applied to the vector column:
    // a future testdata generation could widen array<float> to
    // array<double>. Every similarity path widens per-element through
    // Cosine.prepared, so both encodings must yield identical top-k.
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.25f)), (2L, Seq(0.9f, 0.1f, 0.25f)),
      (3L, Seq(-1.0f, 0.5f, 0.0f)), (4L, Seq(0.0f, 1.0f, -0.5f)))
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] = {
      val p = similarity.Cosine.prepared(df)
      val q = p.filter(col("vec_id") === 1L)
        .select(col("v").as("qv"), col("norm").as("qnorm"))
      p.filter(col("vec_id") =!= 1L).crossJoin(q)
        .select(col("vec_id"),
          round(similarity.Cosine.dot(col("qv"), col("v"), 3) /
            (col("qnorm") * col("norm")), 6).as("sim"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        .sortBy(_._1)
    }
    val asFloat = vecs.toDF("vec_id", "embedding")
    val asDouble = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
      .toDF("vec_id", "embedding")
    assert(run(asFloat) == run(asDouble))
  }
}
