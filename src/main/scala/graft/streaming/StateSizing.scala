package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shuffle-partition sizing for the self-contained stream RUNNERS in
  * this package (stage input → run stream → return result).
  *
  * Stateful operators commit every state-store partition on every
  * micro-batch (delta file create + rename each); at small input volumes
  * that fixed O(partitions × batches) cost dominates the actual work —
  * measured on sessionize at sf0.1: 10.6 s with 32 partitions vs 3.2 s
  * with 4, identical output. So the runners size state partitions to the
  * DATA (one per ~100k input rows), floored at 4 for parallelism and
  * capped at the session setting. Production `writeStream` pipelines are
  * unaffected: at cluster scale the session/default parallelism IS the
  * right number, and this helper never raises it.
  */
private[graft] object StateSizing {

  def withStatePartitions[T](spark: SparkSession, inputRows: Long)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val cur = spark.conf.get(key).toInt
    val sized = math.max(4, math.min(cur, (inputRows / 100000L).toInt + 1))
    spark.conf.set(key, sized)
    try body finally spark.conf.set(key, cur.toString)
  }
}
