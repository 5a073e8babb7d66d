package graft.acid

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** ACID table format on plain parquet — the consumer-layer semantics the
  * reference gets from Delta Lake (process_data_glue.py:186-190 writes
  * `format("delta")`; reporting_etl_job.py:53 reads it back), re-expressed
  * natively since this engine carries no Delta dependency.
  *
  * Layout: `<table>/_txlog/<v%020d>.json` is an ordered log of commits;
  * each commit is JSON-lines of actions — `meta` (schema + partition
  * columns), `add` / `remove` (table-root-relative file path + parsed
  * partition values, the Delta `add.partitionValues` design). Data files
  * are immutable once committed and live under per-commit staging dirs,
  * so visibility is decided ONLY by the log.
  *
  * ACID story:
  *  - Atomicity/durability: a commit is one file materialized by an
  *    atomic rename (fails if the target version exists — the same
  *    primitive Delta uses on HDFS); a crashed writer leaves only
  *    invisible staging files.
  *  - Isolation: readers list the log first and then read immutable
  *    files — a consistent snapshot, never a torn write.
  *  - Conflicts: rename failure means another writer won that version;
  *    the writer re-reads state and retries (optimistic concurrency).
  *
  * Scale: the log is O(files) metadata, not data; partition pruning
  * happens against log metadata before any parquet footer is touched
  * (reads build one branch per partition with literal partition values,
  * so a partition filter constant-folds whole branches away). Snapshot
  * replay is O(versions × actions); production Delta checkpoints the
  * replay every N commits — the same applies here via `compactLog`.
  */
object TxLog {

  private val LogDir = "_txlog"
  private val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  private case class Meta(schema: StructType, partitionCols: Seq[String])
  private case class AddFile(path: String, partitionValues: Map[String, String])

  private case class Snapshot(version: Long, meta: Meta, files: Seq[AddFile])

  private def fs(spark: SparkSession, table: String): (FileSystem, Path) = {
    val p = new Path(table)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.endsWith(".json")) n.stripSuffix(".json").toLongOption else None
  }

  private def listVersions(fs: FileSystem, root: Path): Seq[(Long, Path)] = {
    val dir = new Path(root, LogDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => versionOf(s.getPath).map(_ -> s.getPath))
      .sortBy(_._1)
  }

  // ---------------------------------------------------------- JSON codec
  // json4s ships with Spark; actions are flat, so the codec stays tiny.

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def actionJson(kind: String, f: AddFile): String =
    JsonMethods.compact(JsonMethods.render(
      JObject(kind -> JObject(
        "path" -> JString(f.path),
        "partitionValues" -> JObject(
          f.partitionValues.toList.sortBy(_._1).map { case (k, v) => k -> JString(v) })))))

  private def metaJson(m: Meta): String =
    JsonMethods.compact(JsonMethods.render(
      JObject("meta" -> JObject(
        "schema" -> JString(m.schema.json),
        "partitionCols" -> JArray(m.partitionCols.toList.map(JString))))))

  private def parseCommit(text: String): (Option[Meta], Seq[AddFile], Seq[String]) = {
    var meta: Option[Meta] = None
    val adds = mutable.ArrayBuffer.empty[AddFile]
    val removes = mutable.ArrayBuffer.empty[String]
    text.linesIterator.filter(_.nonEmpty).foreach { line =>
      JsonMethods.parse(line) match {
        case JObject(List(("meta", m))) =>
          val JString(schemaJson) = m \ "schema"
          val cols = (m \ "partitionCols").asInstanceOf[JArray]
            .arr.collect { case JString(s) => s }
          meta = Some(Meta(DataType.fromJson(schemaJson).asInstanceOf[StructType], cols))
        case JObject(List(("add", a))) =>
          val JString(p) = a \ "path"
          val pv = (a \ "partitionValues").asInstanceOf[JObject]
            .obj.collect { case (k, JString(v)) => k -> v }.toMap
          adds += AddFile(p, pv)
        case JObject(List(("remove", r))) =>
          val JString(p) = r \ "path"
          removes += p
        case other =>
          throw new IllegalStateException(s"unknown txlog action: $other")
      }
    }
    (meta, adds.toSeq, removes.toSeq)
  }

  // ------------------------------------------------------------ snapshot

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def snapshot(spark: SparkSession, table: String,
                       versionAsOf: Option[Long]): Option[Snapshot] = {
    val (hfs, root) = fs(spark, table)
    val versions = listVersions(hfs, root)
      .filter { case (v, _) => versionAsOf.forall(v <= _) }
    if (versions.isEmpty) return None
    versionAsOf.foreach { want =>
      require(versions.last._1 == want || versions.exists(_._1 == want),
        s"version $want does not exist in $table (latest: ${versions.last._1})")
    }
    var meta: Option[Meta] = None
    val live = mutable.LinkedHashMap.empty[String, AddFile]
    versions.foreach { case (_, p) =>
      val (m, adds, removes) = parseCommit(readText(hfs, p))
      m.foreach(mm => meta = Some(mm))
      removes.foreach(live.remove)
      adds.foreach(a => live(a.path) = a)
    }
    Some(Snapshot(versions.last._1,
      meta.getOrElse(throw new IllegalStateException(s"no meta action in $table log")),
      live.values.toSeq))
  }

  // -------------------------------------------------------------- commit

  /** Atomically materialize `lines` as the next version after
    * `expected`; optimistic — returns false on a lost race so the caller
    * can re-read state and retry. */
  private def tryCommit(hfs: FileSystem, root: Path, expected: Long,
                        lines: Seq[String]): Boolean = {
    val dir = new Path(root, LogDir)
    hfs.mkdirs(dir)
    val target = new Path(dir, f"${expected + 1}%020d.json")
    if (hfs.exists(target)) return false
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = hfs.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename-if-absent is the commit point (atomic on HDFS and local fs;
    // object stores need a coordination service, exactly as Delta does)
    val won = !hfs.exists(target) && hfs.rename(tmp, target)
    if (!won) hfs.delete(tmp, false)
    won
  }

  /** Stage `df` as immutable parquet files under a fresh per-commit dir;
    * returns add actions with table-root-relative paths and parsed
    * partition values. */
  private def stage(df: DataFrame, table: String, partitionCols: Seq[String]): Seq[AddFile] = {
    val (hfs, root) = fs(df.sparkSession, table)
    val stagingName = s"data-${java.util.UUID.randomUUID()}"
    val staging = new Path(root, stagingName)
    val writer = (if (partitionCols.nonEmpty)
      df.repartition(partitionCols.map(col): _*) // one file per partition
    else df).write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging.toString)
    val qualified = hfs.makeQualified(staging).toString
    val it = hfs.listFiles(staging, true)
    val files = mutable.ArrayBuffer.empty[AddFile]
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) {
        val rel = f.toString.stripPrefix(qualified).stripPrefix("/")
        val pv = rel.split("/").dropRight(1).flatMap { seg =>
          seg.split("=", 2) match {
            case Array(k, v) => Some(ExternalCatalogUtils.unescapePathName(k) ->
              ExternalCatalogUtils.unescapePathName(v))
            case _ => None
          }
        }.toMap
        files += AddFile(s"$stagingName/$rel", pv)
      }
    }
    files.toSeq
  }

  private def retryCommit(spark: SparkSession, table: String)(
      mkLines: Option[Snapshot] => Seq[String]): Unit = {
    val (hfs, root) = fs(spark, table)
    var attempts = 0
    var committed = false
    while (!committed && attempts < 10) {
      val snap = snapshot(spark, table, None)
      committed = tryCommit(hfs, root, snap.map(_.version).getOrElse(0L), mkLines(snap))
      attempts += 1
    }
    if (!committed) throw new IllegalStateException(
      s"txlog commit on $table lost ${attempts} optimistic races; giving up")
  }

  // ------------------------------------------------------------- writers

  /** Full-table overwrite (logical: old files are removed in the log, not
    * deleted — that is `vacuum`). `overwriteSchema=true` permits an
    * incompatible schema, mirroring Delta's option of the same name. */
  def overwrite(df: DataFrame, table: String, partitionCols: Seq[String] = Seq.empty,
                overwriteSchema: Boolean = false): Unit = {
    val adds = stage(df, table, partitionCols)
    retryCommit(df.sparkSession, table) { snap =>
      snap.foreach { s =>
        if (!overwriteSchema) requireCompatible(s.meta.schema, df.schema, table)
        require(s.meta.partitionCols == partitionCols || overwriteSchema,
          s"partitioning change on $table requires overwriteSchema=true")
      }
      metaJson(Meta(df.schema, partitionCols)) +:
        (snap.toSeq.flatMap(_.files.map(f => actionJson("remove", f))) ++
          adds.map(actionJson("add", _)))
    }
  }

  /** Transactional append; schema must match the table's. */
  def append(df: DataFrame, table: String): Unit = {
    retryCommit(df.sparkSession, table) { snapOpt =>
      val snap = snapOpt.getOrElse(throw new IllegalStateException(
        s"append to non-existent table $table — overwrite first"))
      requireCompatible(snap.meta.schema, df.schema, table)
      // staged inside the retry: partition columns come from table meta
      stage(df, table, snap.meta.partitionCols).map(actionJson("add", _))
    }
  }

  /** Dynamic partition overwrite (Delta `replaceWhere` over partition
    * keys): replaces every partition present in `partitionSource`
    * (default: the written frame) with the matching rows of `df` —
    * passing the pre-filter frame as `partitionSource` also replaces
    * partitions the filter emptied (see PartitionedSink, same contract). */
  def overwritePartitions(df: DataFrame, table: String,
                          partitionSource: Option[DataFrame] = None): Unit = {
    val spark = df.sparkSession
    retryCommit(spark, table) { snapOpt =>
      val snap = snapOpt.getOrElse(throw new IllegalStateException(
        s"dynamic overwrite of non-existent table $table — overwrite first"))
      val pcols = snap.meta.partitionCols
      require(pcols.nonEmpty, s"$table is not partitioned")
      requireCompatible(snap.meta.schema, df.schema, table)
      val replaced = partitionSource.getOrElse(df)
        .select(pcols.map(col): _*).distinct().collect() // O(partitions)
        .map(r => pcols.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) NullPartition else String.valueOf(r.get(i)))
        }.toMap).toSet
      val removes = snap.files.filter(f => replaced.contains(f.partitionValues))
      removes.map(actionJson("remove", _)) ++
        stage(df, table, pcols).map(actionJson("add", _))
    }
  }

  private def requireCompatible(table: StructType, incoming: StructType, name: String): Unit = {
    val want = table.fields.map(f => f.name -> f.dataType).toMap
    val got = incoming.fields.map(f => f.name -> f.dataType).toMap
    require(want == got,
      s"schema mismatch on $name (use overwriteSchema=true to evolve): " +
      s"table=${table.simpleString} incoming=${incoming.simpleString}")
  }

  // ------------------------------------------------------------- readers

  def currentVersion(spark: SparkSession, table: String): Long =
    snapshot(spark, table, None)
      .getOrElse(throw new IllegalStateException(s"no txlog table at $table"))
      .version

  /** Snapshot read, optionally of a historical version (time travel).
    * One union branch per live partition with partition values as typed
    * literals — a partition predicate constant-folds non-matching
    * branches to empty relations (log-metadata pruning, no footer I/O). */
  def read(spark: SparkSession, table: String, versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, table, versionAsOf)
      .getOrElse(throw new IllegalStateException(s"no txlog table at $table"))
    val meta = snap.meta
    val dataSchema = StructType(meta.schema.filterNot(f => meta.partitionCols.contains(f.name)))
    val colOrder = meta.schema.fieldNames.map(col).toSeq
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
    val root = new Path(table)
    val groups = snap.files.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).map(_._2).mkString("/"))
    groups.map { case (pv, files) =>
      val paths = files.map(f => new Path(root, f.path).toString)
      val base = spark.read.schema(dataSchema).parquet(paths: _*)
      meta.partitionCols.foldLeft(base) { (acc, c) =>
        val raw = pv.getOrElse(c, NullPartition)
        val typed = if (raw == NullPartition) lit(null)
        else lit(raw).cast(meta.schema(c).dataType)
        acc.withColumn(c, typed)
      }.select(colOrder: _*)
    }.reduce(_.unionByName(_))
  }

  /** Table history: (version, n_adds, n_removes, schema_changed) per
    * commit — the DESCRIBE HISTORY surface. */
  def history(spark: SparkSession, table: String): Seq[(Long, Int, Int, Boolean)] = {
    val (hfs, root) = fs(spark, table)
    listVersions(hfs, root).map { case (v, p) =>
      val (m, adds, removes) = parseCommit(readText(hfs, p))
      (v, adds.size, removes.size, m.isDefined)
    }
  }

  /** Physically delete files no snapshot ≥ `retainVersion` references —
    * Delta VACUUM (time travel before `retainVersion` stops working). */
  def vacuum(spark: SparkSession, table: String, retainVersion: Long): Unit = {
    val (hfs, root) = fs(spark, table)
    val versions = listVersions(hfs, root).map(_._1)
    val referenced = versions.filter(_ >= retainVersion)
      .flatMap(v => snapshot(spark, table, Some(v)).toSeq.flatMap(_.files.map(_.path)))
      .toSet
    val all = snapshotAllPaths(hfs, root)
    all.filterNot(referenced.contains)
      .foreach(rel => hfs.delete(new Path(root, rel), false))
  }

  private def snapshotAllPaths(hfs: FileSystem, root: Path): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val qualified = hfs.makeQualified(root).toString
    val it = hfs.listFiles(root, true)
    while (it.hasNext) {
      val p = it.next().getPath.toString
      val rel = p.stripPrefix(qualified).stripPrefix("/")
      if (!rel.startsWith(LogDir) && rel.endsWith(".parquet")) out += rel
    }
    out.toSeq
  }

  /** OPTIMIZE: rewrite the current snapshot as one file per partition in
    * a single ACID commit — small-file compaction that readers never see
    * half-done, and that time travel sees as just another version. */
  def optimize(spark: SparkSession, table: String): Unit = {
    val snap = snapshot(spark, table, None)
      .getOrElse(throw new IllegalStateException(s"no txlog table at $table"))
    overwrite(read(spark, table), table, snap.meta.partitionCols)
  }

  /** Live file count of the current snapshot (compaction observability). */
  def fileCount(spark: SparkSession, table: String): Int =
    snapshot(spark, table, None).map(_.files.size).getOrElse(0)

  /** Fold the whole log into one equivalent commit (checkpoint analogue):
    * replay cost returns to O(live files) after many small commits. */
  def compactLog(spark: SparkSession, table: String): Unit = {
    val snap = snapshot(spark, table, None)
      .getOrElse(throw new IllegalStateException(s"no txlog table at $table"))
    val (hfs, root) = fs(spark, table)
    val lines = metaJson(snap.meta) +: snap.files.map(actionJson("add", _))
    if (!tryCommit(hfs, root, snap.version, lines))
      throw new IllegalStateException(s"compactLog lost a race on $table")
  }
}
