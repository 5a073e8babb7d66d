package graft.acid

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.{col, count, lit, when}
import org.apache.spark.sql.types.{DataType, StructType}

/** One live data file of a txlog table: table-root-relative path, parsed
  * partition values, physical size, and footer-derived column min/max
  * ranges (the data-skipping input; absent entries mean "no bound").
  * `size = -1` means the log predates size recording; the snapshot
  * reader fills it by stat-ing the file — a 0 would silently produce
  * zero splits (an EMPTY read) and a 0 `sizeInBytes` (inviting
  * broadcast of an arbitrarily large table). */
private[graft] case class AddFile(
    path: String,
    partitionValues: Map[String, String],
    size: Long = -1L,
    numRecords: Long = -1L,
    minValues: Map[String, Any] = Map.empty,
    maxValues: Map[String, Any] = Map.empty)

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
  * happens against log metadata before any parquet footer is touched —
  * reads go through a snapshot-backed [[TxLogFileIndex]] (one scan node
  * regardless of partition count), which also skips files on
  * NON-partition predicates via per-file column min/max recorded in each
  * add action at commit time ([[ParquetStats]], the Delta `add.stats`
  * design). Snapshot replay is O(versions × actions); production Delta
  * checkpoints the replay every N commits — the same applies here via
  * `compactLog`.
  */
object TxLog {

  private val LogDir = "_txlog"
  private[acid] val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  private case class Meta(schema: StructType, partitionCols: Seq[String],
                          constraints: Map[String, String] = Map.empty)

  private case class Snapshot(version: Long, meta: Meta, files: Seq[AddFile])

  /** MERGE observability: how much of the table was rewritten. */
  case class MergeStats(filesRewritten: Int, filesTotalBefore: Int, filesAdded: Int)

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

  private def statValueJson(v: Any): JValue = v match {
    case l: Long => JLong(l)
    case d: Double => JDouble(d)
    case s: String => JString(s)
    case other => JString(String.valueOf(other))
  }

  private def statMapJson(m: Map[String, Any]): JObject =
    JObject(m.toList.sortBy(_._1).map { case (k, v) => k -> statValueJson(v) })

  private def actionJson(kind: String, f: AddFile): String = {
    val base = List(
      "path" -> (JString(f.path): JValue),
      "partitionValues" -> (JObject(
        f.partitionValues.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }): JValue))
    // stats ride only on adds; removes identify the file by path alone
    val withStats = if (kind == "add") base ++ List(
      "size" -> (JLong(f.size): JValue),
      "numRecords" -> (JLong(f.numRecords): JValue),
      "minValues" -> (statMapJson(f.minValues): JValue),
      "maxValues" -> (statMapJson(f.maxValues): JValue))
    else base
    JsonMethods.compact(JsonMethods.render(JObject(kind -> JObject(withStats))))
  }

  private def metaJson(m: Meta): String =
    JsonMethods.compact(JsonMethods.render(
      JObject("meta" -> JObject(
        "schema" -> JString(m.schema.json),
        "partitionCols" -> JArray(m.partitionCols.toList.map(JString)),
        "constraints" -> JObject(
          m.constraints.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) })))))

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
          val cons = m \ "constraints" match {
            case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
            case _ => Map.empty[String, String]
          }
          meta = Some(Meta(
            DataType.fromJson(schemaJson).asInstanceOf[StructType], cols, cons))
        case JObject(List(("add", a))) =>
          val JString(p) = a \ "path"
          val pv = (a \ "partitionValues").asInstanceOf[JObject]
            .obj.collect { case (k, JString(v)) => k -> v }.toMap
          def statMap(field: String): Map[String, Any] = a \ field match {
            case JObject(fields) => fields.collect {
              case (k, JInt(i)) => k -> (i.toLong: Any)
              case (k, JLong(l)) => k -> (l: Any)
              case (k, JDouble(d)) => k -> (d: Any)
              case (k, JString(s)) => k -> (s: Any)
            }.toMap
            case _ => Map.empty
          }
          def longOf(field: String, dflt: Long): Long = a \ field match {
            case JInt(i) => i.toLong
            case JLong(l) => l
            case _ => dflt
          }
          adds += AddFile(p, pv, longOf("size", -1L), longOf("numRecords", -1L),
            statMap("minValues"), statMap("maxValues"))
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
    // legacy logs (pre-size actions) parse as size=-1: fill by stat-ing
    // once per snapshot, loudly (FileNotFound surfaces) — never a silent
    // 0 that reads as empty (see [[AddFile]])
    val files = live.values.toSeq.map { f =>
      if (f.size >= 0) f
      else f.copy(size = hfs.getFileStatus(new Path(root, f.path)).getLen)
    }
    Some(Snapshot(versions.last._1,
      meta.getOrElse(throw new IllegalStateException(s"no meta action in $table log")),
      files))
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
    * partition values. `rearrange=false` keeps the caller's physical
    * layout (clustered optimize arranges its own range partitioning). */
  private def stage(df: DataFrame, table: String, partitionCols: Seq[String],
                    rearrange: Boolean = true): Seq[AddFile] = {
    val (hfs, root) = fs(df.sparkSession, table)
    val stagingName = s"data-${java.util.UUID.randomUUID()}"
    val staging = new Path(root, stagingName)
    val writer = (if (partitionCols.nonEmpty && rearrange)
      df.repartition(partitionCols.map(col): _*) // one file per partition
    else df).write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging.toString)
    val qualified = hfs.makeQualified(staging).toString
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val it = hfs.listFiles(staging, true)
    val files = mutable.ArrayBuffer.empty[AddFile]
    while (it.hasNext) {
      val status = it.next()
      val f = status.getPath
      if (f.getName.endsWith(".parquet")) {
        val rel = f.toString.stripPrefix(qualified).stripPrefix("/")
        val pv = rel.split("/").dropRight(1).flatMap { seg =>
          seg.split("=", 2) match {
            case Array(k, v) => Some(ExternalCatalogUtils.unescapePathName(k) ->
              ExternalCatalogUtils.unescapePathName(v))
            case _ => None
          }
        }.toMap
        // footer metadata only (no data I/O) — the commit-time stats
        // collection that buys read-time file skipping
        val (numRecords, mins, maxs) = ParquetStats.readFooter(conf, f)
        files += AddFile(s"$stagingName/$rel", pv, status.getLen, numRecords,
          mins, maxs)
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
                overwriteSchema: Boolean = false): Unit =
    overwriteImpl(df, table, partitionCols, overwriteSchema, rearrange = true)

  private def overwriteImpl(df: DataFrame, table: String, partitionCols: Seq[String],
                            overwriteSchema: Boolean, rearrange: Boolean): Unit = {
    val adds = stage(df, table, partitionCols, rearrange)
    retryCommit(df.sparkSession, table) { snap =>
      snap.foreach { s =>
        if (!overwriteSchema) requireCompatible(s.meta.schema, df.schema, table)
        require(s.meta.partitionCols == partitionCols || overwriteSchema,
          s"partitioning change on $table requires overwriteSchema=true")
      }
      // constraints survive overwrites; overwriteSchema drops them (the
      // predicate may no longer resolve against the new schema)
      val kept = if (overwriteSchema) Map.empty[String, String]
                 else snap.map(_.meta.constraints).getOrElse(Map.empty)
      requireConstraintsSatisfied(df, kept, table)
      metaJson(Meta(df.schema, partitionCols, kept)) +:
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
      requireConstraintsSatisfied(df, snap.meta.constraints, table)
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
      requireConstraintsSatisfied(df, snap.meta.constraints, table)
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

  /** Copy-on-write MERGE (upsert) keyed on `keyCols` — Delta's
    * `MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE SET *
    * WHEN NOT MATCHED THEN INSERT *`:
    *   1. find the files containing rows whose key matches the source
    *      (file-granular: one semi-join over the snapshot with the
    *      `_metadata.file_path` column the relation exposes);
    *   2. rewrite ONLY those files, replacing matched rows wholesale
    *      with their source row (a key matched by the source updates
    *      every copy) and keeping unmatched neighbors byte-identical;
    *   3. append source rows matching nothing as inserts;
    *   4. one ACID commit: remove touched files, add rewritten ones.
    * Untouched files are never read past their key column nor
    * rewritten — at 100 TB a merge touching one partition's files costs
    * that partition, not the table. Optimistic like every writer here:
    * a lost commit race recomputes against the new snapshot.
    *
    * The source must be key-unique: two source rows with the same key
    * would each claim the same target row, so the result would depend on
    * join order — like Delta's MERGE, that is an error here, detected
    * up-front (one groupBy-count of the source keys), never silent row
    * multiplication. All three key joins (touched-file semi, update,
    * insert anti) use plain `=` SQL-MERGE equality: a NULL-keyed source
    * row matches nothing and inserts; a NULL-keyed target row is never
    * updated. */
  def merge(source: DataFrame, table: String, keyCols: Seq[String]): MergeStats = {
    val spark = source.sparkSession
    val (hfs, root) = fs(spark, table)
    val qroot = hfs.makeQualified(root).toString
    val dupKeys = source.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select(keyCols.map(col): _*).take(3)
    if (dupKeys.nonEmpty) throw new IllegalArgumentException(
      s"merge source has duplicate rows for key (${keyCols.mkString(", ")}) — " +
      s"e.g. ${dupKeys.mkString("; ")}. Collapse the source to one row per key " +
      "(StreamMerge does this per micro-batch) before merging.")
    var attempts = 0
    while (attempts < 10) {
      val snap = snapshot(spark, table, None).getOrElse(throw new IllegalStateException(
        s"merge into non-existent table $table — overwrite first"))
      requireCompatible(snap.meta.schema, source.schema, table)
      val cols = snap.meta.schema.fieldNames.toSeq
      val src = source.select(cols.map(col): _*)
      val full = relationFor(spark, table, snap.meta, snap.files)._1
      val srcKeys = src.select(keyCols.map(col): _*).distinct()
      // file-granular match: which live files hold a matched key
      val touchedPaths = relationFor(spark, table, snap.meta, snap.files)._1
        .withColumn("__path", col("_metadata.file_path"))
        .join(srcKeys, keyCols, "left_semi")
        .select("__path").distinct().collect()
        .map(_.getString(0).stripPrefix(qroot).stripPrefix("/")).toSet
      val touched = snap.files.filter(f => touchedPaths.contains(f.path))
      val touchedRows = relationFor(spark, table, snap.meta, touched)._1
      val joinCond = keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
      val updated = touchedRows.alias("t")
        .join(src.withColumn("__m", lit(true)).alias("s"), joinCond, "left")
        .select(cols.map { c =>
          if (keyCols.contains(c)) col(s"t.$c").as(c)
          else when(col("s.__m").isNotNull, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
        }: _*)
      val inserts = src.join(
        full.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
      val staged = updated.unionByName(inserts)
      requireConstraintsSatisfied(staged, snap.meta.constraints, table)
      val adds = stage(staged, table, snap.meta.partitionCols)
      val lines = touched.map(actionJson("remove", _)) ++ adds.map(actionJson("add", _))
      if (tryCommit(hfs, root, snap.version, lines))
        return MergeStats(touched.size, snap.files.size, adds.size)
      attempts += 1 // lost the race: recompute against the new snapshot
    }
    throw new IllegalStateException(
      s"txlog merge on $table lost $attempts optimistic races; giving up")
  }

  /** Copy-on-write DELETE: drop rows matching `condition`. File-granular
    * like [[merge]] — only files that MAY hold a matching row (decided
    * by partition pruning + min/max skipping against log metadata, zero
    * data I/O) are read and rewritten without their matching rows; a
    * file whose survivors are unchanged in count is re-added as written.
    * One ACID commit. */
  def delete(spark: SparkSession, table: String,
             condition: org.apache.spark.sql.Column): MergeStats =
    rewriteWhere(spark, table, condition)(
      (rows, cond) => rows.filter(!cond || cond.isNull))

  /** Copy-on-write UPDATE: `SET col = expr` on rows matching `condition`.
    * Same file-granular selection as [[delete]]. */
  def update(spark: SparkSession, table: String,
             condition: org.apache.spark.sql.Column,
             set: Map[String, org.apache.spark.sql.Column]): MergeStats =
    rewriteWhere(spark, table, condition) { (rows, cond) =>
      rows.select(rows.columns.toSeq.map { c =>
        set.get(c) match {
          case Some(e) => when(cond, e).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*)
    }

  /** Shared copy-on-write kernel for predicate-addressed row operations:
    * candidate files via the [[TxLogFileIndex]] pruning path (the same
    * skipping reads get), rewrite = `transform(candidateRows, cond)`,
    * commit removes candidates and adds rewrites. */
  private def rewriteWhere(spark: SparkSession, table: String,
      condition: org.apache.spark.sql.Column)(
      transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame): MergeStats = {
    val (hfs, root) = fs(spark, table)
    val qroot = hfs.makeQualified(root).toString
    var attempts = 0
    while (attempts < 10) {
      val snap = snapshot(spark, table, None).getOrElse(throw new IllegalStateException(
        s"row-level op on non-existent table $table — overwrite first"))
      // file-granular candidates: which files may hold a matching row
      val touchedPaths = relationFor(spark, table, snap.meta, snap.files)._1
        .withColumn("__path", col("_metadata.file_path"))
        .filter(condition)
        .select("__path").distinct().collect()
        .map(_.getString(0).stripPrefix(qroot).stripPrefix("/")).toSet
      val touched = snap.files.filter(f => touchedPaths.contains(f.path))
      if (touched.isEmpty) return MergeStats(0, snap.files.size, 0)
      val rows = relationFor(spark, table, snap.meta, touched)._1
      val rewritten = transform(rows, condition)
      requireConstraintsSatisfied(rewritten, snap.meta.constraints, table)
      val adds = stage(rewritten, table, snap.meta.partitionCols)
      val lines = touched.map(actionJson("remove", _)) ++ adds.map(actionJson("add", _))
      if (tryCommit(hfs, root, snap.version, lines))
        return MergeStats(touched.size, snap.files.size, adds.size)
      attempts += 1
    }
    throw new IllegalStateException(
      s"txlog row-level op on $table lost $attempts optimistic races; giving up")
  }

  /** CHECK-constraint enforcement (Delta `ALTER TABLE ADD CONSTRAINT`):
    * one filter-count scan of the written frame per constrained commit —
    * a violation aborts BEFORE the commit, so constrained tables never
    * contain a row failing their invariants. */
  private def requireConstraintsSatisfied(df: DataFrame,
      constraints: Map[String, String], table: String): Unit =
    constraints.foreach { case (name, sql) =>
      val bad = df.filter(!org.apache.spark.sql.functions.expr(sql) ||
        org.apache.spark.sql.functions.expr(sql).isNull).count()
      if (bad > 0) throw new IllegalArgumentException(
        s"CHECK constraint `$name` ($sql) violated by $bad row(s) — commit aborted on $table")
    }

  /** Register a CHECK constraint after validating the CURRENT snapshot
    * satisfies it; every subsequent write validates against it. */
  def addCheckConstraint(spark: SparkSession, table: String,
                         name: String, predicateSql: String): Unit = {
    val (hfs, root) = fs(spark, table)
    retryCommit(spark, table) { snapOpt =>
      val snap = snapOpt.getOrElse(throw new IllegalStateException(
        s"no txlog table at $table"))
      requireConstraintsSatisfied(
        relationFor(spark, table, snap.meta, snap.files)._1,
        Map(name -> predicateSql), table)
      Seq(metaJson(snap.meta.copy(
        constraints = snap.meta.constraints + (name -> predicateSql))))
    }
  }

  def dropCheckConstraint(spark: SparkSession, table: String, name: String): Unit =
    retryCommit(spark, table) { snapOpt =>
      val snap = snapOpt.getOrElse(throw new IllegalStateException(
        s"no txlog table at $table"))
      Seq(metaJson(snap.meta.copy(constraints = snap.meta.constraints - name)))
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
    * One [[TxLogFileIndex]]-backed relation — a SINGLE scan node whose
    * plan size is O(1) in partition count; partition pruning and
    * min/max data skipping both run against log metadata inside
    * `listFiles`, before any footer I/O. */
  def read(spark: SparkSession, table: String, versionAsOf: Option[Long] = None): DataFrame =
    readWithSkipInfo(spark, table, versionAsOf)._1

  /** [[read]] plus the backing file index, whose `lastListing` exposes
    * (files selected, files total) after the scan plans — the
    * data-skipping observability hook. */
  private[graft] def readWithSkipInfo(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): (DataFrame, TxLogFileIndex) = {
    val snap = snapshot(spark, table, versionAsOf)
      .getOrElse(throw new IllegalStateException(s"no txlog table at $table"))
    relationFor(spark, table, snap.meta, snap.files)
  }

  private def relationFor(spark: SparkSession, table: String, meta: Meta,
      files: Seq[AddFile]): (DataFrame, TxLogFileIndex) = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val (hfs, root) = fs(spark, table)
    val partitionSchema = StructType(meta.partitionCols.map(c => meta.schema(c)))
    val dataSchema = StructType(
      meta.schema.filterNot(f => meta.partitionCols.contains(f.name)))
    val idx = new TxLogFileIndex(spark, hfs.makeQualified(root), partitionSchema, files)
    val rel = HadoopFsRelation(idx, partitionSchema, dataSchema,
      bucketSpec = None, new ParquetFileFormat(), Map.empty[String, String])(spark)
    (spark.baseRelationToDataFrame(rel)
      .select(meta.schema.fieldNames.map(col).toSeq: _*), idx)
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
    * half-done, and that time travel sees as just another version.
    *
    * With `clusterBy`, the rewrite range-partitions and sorts rows by
    * the given columns (Delta's `OPTIMIZE ... ZORDER BY` for the
    * single-column/prefix case): each rewritten file then covers a tight
    * min/max range on those columns, so the footer stats recorded in the
    * new add actions make data skipping on them near-perfect. `nFiles`
    * bounds the clustered file count (per table, pre-partitioning). */
  def optimize(spark: SparkSession, table: String,
               clusterBy: Seq[String] = Seq.empty, nFiles: Int = 16): Unit = {
    val snap = snapshot(spark, table, None)
      .getOrElse(throw new IllegalStateException(s"no txlog table at $table"))
    val current = read(spark, table)
    val pcols = snap.meta.partitionCols
    if (clusterBy.isEmpty)
      overwrite(current, table, pcols)
    else if (pcols.isEmpty)
      // range-clustered files: each covers a tight clusterBy range
      overwriteImpl(current.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*),
        table, pcols, overwriteSchema = false, rearrange = false)
    else
      // one file per partition, rows sorted by clusterBy inside it —
      // parquet row-group stats then prune within the file
      overwriteImpl(current.repartition(pcols.map(col): _*)
          .sortWithinPartitions((pcols ++ clusterBy).map(col): _*),
        table, pcols, overwriteSchema = false, rearrange = false)
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
