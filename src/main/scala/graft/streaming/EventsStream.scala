package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming analytics over the events feed.
  *
  * The aggregation logic is ONE function applied to either a batch or a
  * streaming DataFrame — Structured Streaming's contract — so the batch
  * path doubles as the oracle-checkable equivalent of the streaming query.
  *
  * At scale: the watermark bounds state (late events beyond 1 hour are
  * dropped), and the tumbling window + event_type key gives a
  * low-cardinality shuffle; state store size is O(windows × types).
  */
object EventsStream {

  /** Tumbling 1-hour window aggregate per event type. Works on batch and
    * streaming frames alike. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
              col("event_type"), col("n_events"), col("total_value"))

  /** Batch equivalent (oracle: date_trunc-hour grouping). */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    hourlyAgg(events).orderBy("window_start", "event_type")

  /** Streaming source over a directory of event parquet files with the
    * given schema; watermarked so windowed state is bounded. */
  def streamingHourlyAgg(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    hourlyAgg(
      spark.readStream.schema(schema).parquet(dir)
        .withWatermark("ts", "1 hour"))

  // ------------------------------------------------- stateful sessionize

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(openStartUs: Long, openLastUs: Long, openCount: Long)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long)

  /** Custom streaming state: gap-based sessionization via
    * flatMapGroupsWithState. Per user, events are folded into an open
    * session; a gap > `gapMinutes` closes it and emits. State is one
    * (start, last, count) triple per user — O(users), bounded further by
    * the state timeout at cluster scale. The final open session stays in
    * state (emitted on timeout in production; tests read closed ones). */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[SessionEvent],
                         gapMinutes: Int = 30): org.apache.spark.sql.Dataset[UserSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    // µs-precision round trip: Timestamp(ms) alone would truncate the
    // microsecond component the events carry
    def usToTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }

    def fold(userId: Long, it: Iterator[SessionEvent],
             state: GroupState[SessionState]): Iterator[UserSession] = {
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos))
      var closed = List.newBuilder[UserSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
        cur match {
          case Some(s) if us - s.openLastUs <= gapUs =>
            cur = Some(s.copy(openLastUs = us, openCount = s.openCount + 1))
          case Some(s) =>
            closed += UserSession(userId,
              usToTs(s.openStartUs), usToTs(s.openLastUs), s.openCount)
            cur = Some(SessionState(us, us, 1))
          case None =>
            cur = Some(SessionState(us, us, 1))
        }
      }
      cur.foreach(state.update)
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }

  /** End-to-end stateful sessionization as an actual STREAMING query:
    * stage the events as a file-source directory, run
    * [[sessionizeStateful]] over `readStream` into a memory sink, and
    * return the emitted (closed) sessions. Each user's final session
    * stays open in the state store — production emits it via a state
    * timeout; the batch-oracle equivalent is "all sessions minus each
    * user's last". */
  def runSessionizeStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_src").toString
    events.select("user_id", "ts").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val name = s"graft_sessions_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = sessionizeStateful(
        spark.readStream.schema(schema).parquet(dir).as[SessionEvent])
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
