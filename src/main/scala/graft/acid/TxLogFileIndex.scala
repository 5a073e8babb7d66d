package graft.acid

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Snapshot-backed [[FileIndex]]: the txlog analogue of Delta's
  * `TahoeLogFileIndex`. The file list and partition values come from log
  * METADATA — no directory listing, no parquet footer I/O on the read
  * path — and the scan plan is a single relation regardless of partition
  * count (the round-2 union-per-partition read built O(partitions) plan
  * branches).
  *
  * Pruning happens in [[listFiles]], the hook Catalyst calls with the
  * split partition/data predicates:
  *  - partition filters are bound to the partition schema and evaluated
  *    against each partition's typed values (log metadata);
  *  - data filters are tested against each file's column min/max ranges
  *    lifted from footers at COMMIT time ([[ParquetStats]]) — files whose
  *    range provably excludes the predicate never reach the scan, so a
  *    selective predicate on a non-partition column (`event_id BETWEEN
  *    ...`) touches a handful of files instead of every footer at 100 TB.
  *
  * The skipper is conservative: any shape it does not understand, any
  * column without stats, any non-ASCII string bound keeps the file.
  */
private[graft] class TxLogFileIndex(
    spark: SparkSession,
    root: Path,
    override val partitionSchema: StructType,
    addFiles: Seq[AddFile],
    /** generated partition columns: pcol → (kind, srcCol), consumed by
      * [[graft.plans.GeneratedPartitionFilters]]. */
    val generated: Map[String, (String, String)] = Map.empty) extends FileIndex {

  /** (selected files, total files) of the most recent [[listFiles]] —
    * data-skipping observability for specs and registry queries. */
  @volatile var lastListing: Option[(Int, Int)] = None

  /** SQL of the partition filters the most recent [[listFiles]] was
    * handed — lets specs and probes observe that a DERIVED partition
    * predicate (a generated column the query never mentioned) actually
    * reached partition pruning. */
  @volatile var lastPartitionFilters: Seq[String] = Seq.empty

  override def rootPaths: Seq[Path] = Seq(root)

  override def sizeInBytes: Long = addFiles.map(_.size).sum

  override def inputFiles: Array[String] =
    addFiles.map(f => new Path(root, f.path).toString).toArray

  override def refresh(): Unit = ()

  private def typedPartitionRow(pv: Map[String, String]): InternalRow =
    InternalRow.fromSeq(partitionSchema.map { f =>
      pv.get(f.name) match {
        case None | Some(TxLog.NullPartition) => null
        case Some(raw) => castPartitionValue(raw, f.dataType)
      }
    })

  private def castPartitionValue(raw: String, dt: DataType): Any =
    Cast(Literal(UTF8String.fromString(raw), StringType), dt,
      Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)

  private def bindToPartitionSchema(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      val idx = partitionSchema.fieldIndex(a.name)
      BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    lastPartitionFilters = partitionFilters.map(_.sql)
    val groups = addFiles.groupBy(_.partitionValues).toSeq
      .map { case (pv, fs) => (typedPartitionRow(pv), fs) }
    val afterPartition =
      if (partitionFilters.isEmpty) groups
      else {
        val pred = Predicate.create(
          bindToPartitionSchema(partitionFilters.reduce(And)))
        pred.initialize(0)
        groups.filter { case (row, _) => pred.eval(row) }
      }
    val selected = afterPartition.map { case (row, fs) =>
      (row, fs.filter(f => dataFilters.forall(mayMatch(_, f))))
    }.filter(_._2.nonEmpty)
    lastListing = Some((selected.map(_._2.size).sum, addFiles.size))
    selected.map { case (row, fs) =>
      PartitionDirectory(row, fs.map { f =>
        // a 0-length entry would yield ZERO splits — the file silently
        // vanishes from the scan. No real parquet file is 0 bytes
        // (snapshot stats legacy entries), so this is always corruption.
        if (f.size <= 0) throw new IllegalStateException(
          s"txlog add action for ${f.path} carries size ${f.size}; " +
          "refusing a scan that would silently read the file as empty")
        FileStatusWithMetadata(
          new FileStatus(f.size, false, 1, 128L * 1024 * 1024, 0L,
            new Path(root, f.path)))
      })
    }
  }

  // ------------------------------------------------------- data skipping

  /** Could `f` contain a row satisfying `e`? Conservative three-valued
    * logic collapsed to may/must-not. */
  private def mayMatch(e: Expression, f: AddFile): Boolean = e match {
    case And(l, r) => mayMatch(l, f) && mayMatch(r, f)
    case Or(l, r) => mayMatch(l, f) || mayMatch(r, f)
    case EqualTo(a: AttributeReference, l @ Literal(v, _)) =>
      rangeMay(f, a.name, lo = Some(v), hi = Some(v)) && bloomMay(f, a.name, l)
    case EqualTo(l @ Literal(v, _), a: AttributeReference) =>
      rangeMay(f, a.name, lo = Some(v), hi = Some(v)) && bloomMay(f, a.name, l)
    case GreaterThan(a: AttributeReference, Literal(v, _)) =>
      rangeMay(f, a.name, lo = Some(v), hi = None, loStrict = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      rangeMay(f, a.name, lo = Some(v), hi = None)
    case LessThan(a: AttributeReference, Literal(v, _)) =>
      rangeMay(f, a.name, lo = None, hi = Some(v), hiStrict = true)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      rangeMay(f, a.name, lo = None, hi = Some(v))
    case GreaterThan(Literal(v, _), a: AttributeReference) =>
      rangeMay(f, a.name, lo = None, hi = Some(v), hiStrict = true)
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      rangeMay(f, a.name, lo = None, hi = Some(v))
    case LessThan(Literal(v, _), a: AttributeReference) =>
      rangeMay(f, a.name, lo = Some(v), hi = None, loStrict = true)
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      rangeMay(f, a.name, lo = Some(v), hi = None)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case l @ Literal(v, _) =>
        rangeMay(f, a.name, lo = Some(v), hi = Some(v)) && bloomMay(f, a.name, l) }
    case _ => true
  }

  // --------------------------------------------------- bloom file skipping

  private val bloomCache = scala.collection.mutable.Map
    .empty[(String, String), Option[org.apache.spark.util.sketch.BloomFilter]]

  /** Bloom probe for an equality literal: false ONLY when the file has a
    * bloom for the column and it excludes the value. The canonical form
    * must match the write side's `cast(col as string)` byte-for-byte, so
    * only literal types whose Catalyst string cast is stable are probed
    * (integral, string, boolean, double/float); anything else —
    * date/timestamp/decimal formatting — conservatively keeps the file. */
  private def bloomMay(f: AddFile, colName: String, l: Literal): Boolean =
    f.blooms.get(colName) match {
      case None => true
      case Some(b64) =>
        import org.apache.spark.sql.types._
        val probeable = l.dataType match {
          case ByteType | ShortType | IntegerType | LongType | StringType |
               BooleanType | DoubleType | FloatType => true
          case _ => false
        }
        if (!probeable || l.value == null) true
        else bloomCache.getOrElseUpdate((f.path, colName),
          try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(
              java.util.Base64.getDecoder.decode(b64))))
          catch { case _: Exception => None } // unreadable bloom: no skipping
        ).forall { bf =>
          val canonical = Cast(l, StringType,
            Some(spark.sessionState.conf.sessionLocalTimeZone))
            .eval(null).asInstanceOf[UTF8String].toString
          bf.mightContainString(canonical)
        }
    }

  /** May the file's [min,max] for `col` intersect [lo, hi]? */
  private def rangeMay(f: AddFile, col: String, lo: Option[Any], hi: Option[Any],
                       loStrict: Boolean = false, hiStrict: Boolean = false): Boolean = {
    val fMin = f.minValues.get(col)
    val fMax = f.maxValues.get(col)
    val loOk = (hi, fMin) match { // predicate upper bound vs file minimum
      case (Some(h), Some(m)) => cmp(m, h) match {
        case Some(c) => if (hiStrict) c < 0 else c <= 0
        case None => true
      }
      case _ => true
    }
    val hiOk = (lo, fMax) match { // predicate lower bound vs file maximum
      case (Some(l), Some(m)) => cmp(m, l) match {
        case Some(c) => if (loStrict) c > 0 else c >= 0
        case None => true
      }
      case _ => true
    }
    loOk && hiOk
  }

  /** Compare a footer-stat value against a Catalyst literal's internal
    * value; None when the pairing is unsupported (no skipping). */
  private def cmp(stat: Any, lit: Any): Option[Int] = (stat, lit) match {
    case (s: Long, l: Number) if !l.isInstanceOf[java.lang.Double] &&
        !l.isInstanceOf[java.lang.Float] =>
      Some(java.lang.Long.compare(s, l.longValue()))
    case (s: Long, l: Number) => Some(java.lang.Double.compare(s.toDouble, l.doubleValue()))
    case (s: Double, l: Number) => Some(java.lang.Double.compare(s, l.doubleValue()))
    case (s: String, l: UTF8String) =>
      val ls = l.toString
      // java String order == parquet unsigned-byte order only on ASCII
      if (isAscii(s) && isAscii(ls)) Some(s.compareTo(ls)) else None
    case _ => None
  }

  private def isAscii(s: String): Boolean = s.forall(_ < 128)
}
