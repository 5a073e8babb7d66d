package graft.acid

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation

/** Per-file column statistics lifted from parquet footers at commit
  * time — the txlog analogue of Delta's `add.stats`. Footer metadata
  * only: zero data I/O, exact min/max per column chunk, merged across
  * row groups.
  *
  * Values are normalized to the JSON-storable primitives the skipper
  * compares against Catalyst literals: integral/date/timestamp columns
  * as Long (days / micros — parquet's own physical encodings, which are
  * also Catalyst's internal Date/Timestamp values), floating point as
  * Double, UTF-8 binary as String. Columns whose chunks carry no stats
  * (or exotic types) are simply absent — absence always means
  * "cannot skip".
  */
private[acid] object ParquetStats {

  /** (numRecords, minValues, maxValues) for one file. */
  def readFooter(conf: Configuration, file: Path)
      : (Long, Map[String, Any], Map[String, Any]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val mins = scala.collection.mutable.Map.empty[String, Any]
      val maxs = scala.collection.mutable.Map.empty[String, Any]
      val dropped = scala.collection.mutable.Set.empty[String]
      for (b <- blocks; cc <- b.getColumns.asScala) {
        val pathParts = cc.getPath.toArray
        if (pathParts.length == 1) { // top-level scalar columns only
          val name = pathParts(0)
          val stats = cc.getStatistics
          val usable = stats != null && !stats.isEmpty && stats.hasNonNullValue()
          if (!usable) dropped += name
          else normalized(cc.getPrimitiveType.getPrimitiveTypeName,
              cc.getPrimitiveType.getLogicalTypeAnnotation, stats) match {
            case Some((lo, hi)) =>
              mins(name) = mins.get(name).map(minOf(_, lo)).getOrElse(lo)
              maxs(name) = maxs.get(name).map(maxOf(_, hi)).getOrElse(hi)
            case None => dropped += name
          }
        }
      }
      // a column missing stats in ANY row group has no file-level bound
      dropped.foreach { n => mins.remove(n); maxs.remove(n) }
      (numRecords, mins.toMap, maxs.toMap)
    } finally reader.close()
  }

  private def normalized(t: PrimitiveTypeName, logical: LogicalTypeAnnotation,
                         s: org.apache.parquet.column.statistics.Statistics[_])
      : Option[(Any, Any)] = t match {
    case PrimitiveTypeName.INT32 =>
      val st = s.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
      logical match {
        // plain ints and DATE (days) are already Catalyst's internal values;
        // TIME(MILLIS)/DECIMAL(int32) are not — no skipping on those
        case null | _: LogicalTypeAnnotation.IntLogicalTypeAnnotation |
             _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
          Some((st.getMin.toLong, st.getMax.toLong))
        case _ => None
      }
    case PrimitiveTypeName.INT64 =>
      val st = s.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
      logical match {
        case null | _: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
          Some((st.getMin, st.getMax))
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          // Catalyst timestamp literals are MICROS since epoch; footer
          // stats carry the file's own unit — normalize or refuse. A raw
          // compare under outputTimestampType=TIMESTAMP_MILLIS would skip
          // files 1000× too eagerly (silent missing rows).
          ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS =>
              Some((st.getMin, st.getMax))
            case LogicalTypeAnnotation.TimeUnit.MILLIS =>
              try Some((Math.multiplyExact(st.getMin, 1000L),
                        Math.multiplyExact(st.getMax, 1000L)))
              catch { case _: ArithmeticException => None }
            // NANOS may surface as a raw Long column (nanosAsLong) or a
            // truncated timestamp depending on reader config — ambiguous,
            // so never skip on it
            case _ => None
          }
        case _ => None // TIME/DECIMAL(int64): units/scale differ
      }
    case PrimitiveTypeName.DOUBLE =>
      val st = s.asInstanceOf[org.apache.parquet.column.statistics.DoubleStatistics]
      Some((st.getMin, st.getMax))
    case PrimitiveTypeName.FLOAT =>
      val st = s.asInstanceOf[org.apache.parquet.column.statistics.FloatStatistics]
      Some((st.getMin.toDouble, st.getMax.toDouble))
    case PrimitiveTypeName.BINARY
        if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
      val st = s.asInstanceOf[org.apache.parquet.column.statistics.BinaryStatistics]
      Some((st.genericGetMin.toStringUsingUTF8, st.genericGetMax.toStringUsingUTF8))
    case _ => None // boolean/int96/decimal-binary: no skipping
  }

  private def minOf(a: Any, b: Any): Any = (a, b) match {
    case (x: Long, y: Long) => math.min(x, y)
    case (x: Double, y: Double) => math.min(x, y)
    case (x: String, y: String) => if (x <= y) x else y
    case _ => a
  }
  private def maxOf(a: Any, b: Any): Any = (a, b) match {
    case (x: Long, y: Long) => math.max(x, y)
    case (x: Double, y: Double) => math.max(x, y)
    case (x: String, y: String) => if (x >= y) x else y
    case _ => a
  }
}
