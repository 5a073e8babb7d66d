package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.acid.{GraftCatalog, TxLog}

/** Catalog-persisted ANN indexes — "train once, probe many" ACROSS
  * SESSIONS (round 12). [[Pq.indexFor]]/[[IvfPq.indexFor]] cache the
  * trained index in a session-JVM map over session-lifetime scratch
  * dirs: correct within one process, but a NEW session retrains — at
  * 100 TB the one-time Lloyd+encode pass is exactly the cost an engine
  * must NOT pay per restart. This store makes the index a durable
  * catalog artifact, the discipline the incremental-dedup band index
  * (#82) already follows:
  *
  *   - the CODE TABLE is a txlog (ACID) table under the warehouse,
  *     registered by name in [[GraftCatalog]] (the reference's
  *     Glue-registration shape, process_data_glue.py:198-205) — IVF×PQ
  *     keeps its cell-partitioned layout, so the probe's partition
  *     pruning works unchanged through [[TxLog.read]]'s file index;
  *   - the CODEBOOKS (+ IVF centroids + the corpus file-signature
  *     list) are driver metadata, stored as JSON in a commit TAG riding
  *     the same log — index data and index metadata move atomically,
  *     nothing lives in JVM state. A payload above [[CbInlineMax]]
  *     moves to a SIDECAR file referenced by the tag (round 13 — the
  *     tag is parsed by EVERY commitTags listing of the table, sink
  *     watermark reads included; a d=1024 (m,k) shape or a 100k-file
  *     corpus's signature list would otherwise put MBs of JSON on every
  *     listing; the always-inline part is O(1): kind/fp/shape/dist);
  *   - the key is the corpus CONTENT FINGERPRINT (file paths + lengths
  *     + mtimes) plus the index shape: a match loads with ZERO Spark
  *     jobs (catalog file + commit tags are driver file reads, numbers
  *     round-trip exactly through JSON — bit-identical probes).
  *
  * INCREMENTAL MAINTENANCE (round 13): a growing corpus is the normal
  * case — one appended file must not retrain and re-encode everything.
  * The tag stores the corpus's per-file signatures; on a fingerprint
  * miss where the stored files are a STRICT SUBSET of the current ones
  * (append-only growth, every old file unchanged), the store keeps the
  * codebooks (and IVF centroids), reads ONLY the new files, encodes
  * them under the existing artifacts, and appends to the code table in
  * one tagged commit — O(batch) work however large the corpus. A
  * codebook-drift guard protects recall: the tag records the mean
  * cosine distortion `1 − cos(x, x̂)` of a training-time sample, the
  * new batch's distortion is measured the same way (driver arithmetic
  * on ≤[[DriftSample]] vectors), and a batch the old codebooks no
  * longer describe (distortion > 2× baseline + 0.02) falls back to a
  * FULL retrain. Any non-subset change (rewritten/removed files, shape
  * change) retrains too.
  *
  * Loading costs one catalog read + one commit-tag listing per call —
  * driver metadata, no data I/O; no JVM cache sits in front, so a
  * fresh session (or process) exercises the same path the first one
  * does. */
object AnnIndexStore {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val TagPrefix = "annindex:"

  /** Codebook JSON above this inlines as a sidecar file, not in the tag. */
  private[similarity] val CbInlineMax = 256 * 1024

  /** Vectors the drift guard measures (driver metadata: ≤ 64×d doubles). */
  private val DriftSample = 64

  /** How the index for a call was obtained — probe observability. */
  sealed trait IndexOutcome
  object IndexOutcome {
    /** Fingerprint+shape hit: zero Spark jobs, nothing written. */
    case object Loaded extends IndexOutcome
    /** Full train + encode + persist (first build, non-append change,
      * shape change, or drift fallback — `driftFallback` says which). */
    final case class Trained(driftFallback: Boolean) extends IndexOutcome
    /** Append-only growth: stored codebooks kept, only `newFiles` files
      * encoded and appended. */
    final case class Extended(newFiles: Int) extends IndexOutcome
  }

  private def cbJson(cb: Pq.Codebooks): JValue =
    JArray(cb.toList.map(sub =>
      JArray(sub.toList.map(c => JArray(c.toList.map(JDouble(_): JValue))))))

  private def cbOf(j: JValue): Pq.Codebooks = j match {
    case JArray(subs) => subs.map {
      case JArray(codes) => codes.map {
        case JArray(xs) => xs.map {
          case JDouble(d) => d
          case JInt(i) => i.toDouble // jackson may narrow integral doubles
          case other => throw new IllegalStateException(s"bad codebook cell $other")
        }
        case other => throw new IllegalStateException(s"bad codebook row $other")
      }
      case other => throw new IllegalStateException(s"bad codebook $other")
    }
    case other => throw new IllegalStateException(s"bad codebooks $other")
  }

  private def centroidsJson(cs: Seq[Seq[Double]]): JValue =
    JArray(cs.toList.map(c => JArray(c.toList.map(JDouble(_): JValue))))

  private def centroidsOf(j: JValue): Seq[(Int, Seq[Double])] = j match {
    case JArray(cs) => cs.zipWithIndex.map { case (c, i) =>
      i -> (c match {
        case JArray(xs) => xs.map {
          case JDouble(d) => d
          case JInt(n) => n.toDouble
          case other => throw new IllegalStateException(s"bad centroid $other")
        }
        case other => throw new IllegalStateException(s"bad centroid $other")
      })
    }
    case other => throw new IllegalStateException(s"bad centroids $other")
  }

  /** The tag payload. The file-signature list, `cb`, and `centroids`
    * inline when small; a combined payload above [[CbInlineMax]] goes
    * to a sidecar JSON file under the table dir and the tag carries
    * `cbRef` (its relative path) instead — the sidecar is written
    * BEFORE the tagged commit, so a crash between the two leaves an
    * orphan file, never a dangling reference. The always-inline part
    * is O(1): kind + fingerprint + shape + drift baseline — every
    * `commitTags` listing of the table (sink watermark reads included)
    * parses the tag, so a 100k-file corpus's signature list (MBs of
    * JSON) must never ride inline; the exact-match LOAD path needs
    * only `fp`, and the append-detection path reads the sidecar once
    * on a fingerprint miss. */
  private def tag(spark: SparkSession, tableLoc: String, kind: String,
                  fp: String, shape: Map[String, Long], files: Seq[String],
                  dist: Double, cb: Pq.Codebooks,
                  centroids: Option[Seq[Seq[Double]]]): String = {
    val meta = List[(String, JValue)](
      "kind" -> JString(kind), "fp" -> JString(fp),
      "shape" -> JObject(shape.toList.map { case (k, v) => k -> (JInt(v): JValue) }),
      "dist" -> JDouble(dist))
    val payload = List[(String, JValue)](
      "files" -> JArray(files.toList.map(JString(_): JValue)),
      "cb" -> cbJson(cb)) ++
      centroids.map(cs => "centroids" -> centroidsJson(cs))
    val inline = JsonMethods.compact(JsonMethods.render(JObject(meta ++ payload)))
    val withPayload =
      if (inline.length <= CbInlineMax) inline
      else {
        // fresh sidecar per tag: an extension changes the file list, so
        // a previous sidecar is never reusable (old ones become orphans
        // a vacuum ignores — .json, never .parquet)
        val name = s"_annindex/cb-${java.util.UUID.randomUUID()}.json"
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(tableLoc, name)
        val hfs = p.getFileSystem(conf)
        val out = hfs.create(p, true)
        try out.write(JsonMethods.compact(JsonMethods.render(JObject(payload)))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        JsonMethods.compact(JsonMethods.render(
          JObject(meta :+ ("cbRef" -> (JString(name): JValue)))))
      }
    TagPrefix + withPayload
  }

  /** Latest annindex tag of the cataloged table `name`, parsed, with a
    * `cbRef` sidecar resolved back into the payload — None when the
    * table is absent or carries no index tag. */
  private def loadTag(spark: SparkSession, warehouse: String, name: String)
      : Option[(String, JValue)] =
    GraftCatalog.entries(warehouse).find(_.name == name).flatMap { e =>
      if (!TxLog.exists(spark, e.location)) None
      else TxLog.commitTags(spark, e.location)
        .filter(_._2.startsWith(TagPrefix))
        .sortBy(_._1).lastOption
        .map { case (_, t) =>
          val j = JsonMethods.parse(t.stripPrefix(TagPrefix))
          val resolved = j \ "cbRef" match {
            case JString(ref) =>
              val conf = spark.sparkContext.hadoopConfiguration
              val p = new org.apache.hadoop.fs.Path(e.location, ref)
              val hfs = p.getFileSystem(conf)
              val in = hfs.open(p)
              val text = try {
                val out = new java.io.ByteArrayOutputStream()
                org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
                new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
              } finally in.close()
              JsonMethods.parse(text) match {
                case JObject(fields) => JObject(j.asInstanceOf[JObject].obj ++ fields)
                case other => throw new IllegalStateException(s"bad cb sidecar $other")
              }
            case _ => j
          }
          (e.location, resolved)
        }
    }

  private def str(j: JValue, field: String): String =
    j \ field match { case JString(s) => s; case _ => "" }

  private def dbl(j: JValue, field: String): Option[Double] =
    j \ field match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case _ => None
    }

  private def filesOf(j: JValue): Option[Seq[String]] = j \ "files" match {
    case JArray(fs) => Some(fs.collect { case JString(s) => s })
    case _ => None
  }

  private def shapeOf(j: JValue): Map[String, Long] = j \ "shape" match {
    case JObject(fs) => fs.collect {
      case (k, JInt(v)) => k -> v.toLong
      case (k, JLong(v)) => k -> v
    }.toMap
    case _ => Map.empty
  }

  /** Append-only growth check: every stored signature still present
    * unchanged, and at least one new file. Returns the NEW files'
    * paths. */
  private def appendedFiles(stored: Seq[String],
                            current: Seq[String]): Option[Seq[String]] = {
    val storedSet = stored.toSet
    val currentSet = current.toSet
    if (storedSet.nonEmpty && storedSet.subsetOf(currentSet) &&
        currentSet.size > storedSet.size)
      Some(current.filterNot(storedSet)
        .map(sig => sig.split(":").dropRight(2).mkString(":")))
    else None
  }

  /** Mean cosine distortion `1 − cos(x, x̂)` of `vs` under `cb` —
    * driver arithmetic on a bounded sample, the drift guard's metric
    * (ADC ranking error is bounded by reconstruction error, so a batch
    * whose distortion matches the training baseline probes as well as
    * the original corpus). */
  private[graft] def meanDistortion(vs: Seq[Seq[Double]],
                                    cb: Pq.Codebooks): Double = {
    if (vs.isEmpty) return 0.0
    val m = cb.size
    val subd = cb.head.head.size
    val total = vs.map { v =>
      val xhat = new Array[Double](v.size)
      var j = 0
      while (j < m) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb(j).size) {
          var dd = 0.0
          var i = 0
          while (i < subd) {
            val diff = v(j * subd + i) - cb(j)(c)(i); dd += diff * diff; i += 1
          }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        var i = 0
        while (i < subd) { xhat(j * subd + i) = cb(j)(best)(i); i += 1 }
        j += 1
      }
      val dot = v.indices.map(i => v(i) * xhat(i)).sum
      val nv = math.sqrt(v.map(x => x * x).sum)
      val nx = math.sqrt(xhat.map(x => x * x).sum)
      if (nv == 0 || nx == 0) 0.0 else 1.0 - dot / (nv * nx)
    }.sum
    total / vs.size
  }

  /** Bounded sample of a frame's vectors as driver doubles. */
  private def sampleVectors(emb: DataFrame): Seq[Seq[Double]] =
    emb.select(org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> cast(x as double))").as("v"))
      .limit(DriftSample).collect().map(_.getSeq[Double](0)).toSeq

  /** Only the NEW files' rows — a direct read of exactly those files
    * (O(batch) input by construction; the corpus frame is never
    * rescanned). */
  private def newRowsFrame(spark: SparkSession, like: DataFrame,
                           newPaths: Seq[String]): DataFrame =
    spark.read.schema(org.apache.spark.sql.types.StructType(
        like.schema.fields.toSeq))
      .parquet(newPaths: _*)
      .select(col("vec_id"), col("embedding"))

  private def persist(codes: DataFrame, warehouse: String, name: String,
                      partitionCols: Seq[String],
                      mkTag: String => String): String = {
    val loc = new java.io.File(warehouse, name).toString
    TxLog.overwrite(codes, loc, partitionCols, overwriteSchema = true)
    // the tag rides an empty tagged append: metadata commits atomically
    // into the SAME log as the code table it describes
    TxLog.append(codes.limit(0), loc, commitTag = Some(mkTag(loc)))
    GraftCatalog.register(warehouse, name, loc)
    loc
  }

  /** Drift verdict for an append batch against the stored baseline:
    * retrain when the batch's distortion exceeds BOTH twice the
    * training baseline and an absolute floor of 0.25. The relative term
    * catches distribution shift; the floor keeps the guard honest when
    * the baseline is degenerate — a k≈sample-size codebook MEMORIZES
    * its training residuals (baseline ~0), and without the floor any
    * unseen same-distribution batch would "drift" (measured: ivfpq
    * k=256 over a 400-row corpus). Distortion 0.25 is where ADC
    * ranking genuinely degrades; below it, extension preserves the
    * pinned recall floors. */
  private def driftExceeded(newDist: Double, baseline: Option[Double]): Boolean =
    baseline.exists(b => newDist > math.max(2 * b + 0.02, 0.25))

  /** `df` cast to the code TABLE's exact column types — the persisted
    * schema may differ from the encode expressions' in nested
    * nullability (a parquet round-trip relaxes `array<int>` element
    * nullability) and append requires type equality. */
  private def alignedToTable(spark: SparkSession, loc: String,
                             df: DataFrame): DataFrame = {
    val fields = TxLog.read(spark, loc).schema.fields
    df.select(fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** The persisted PQ index for `(warehouse, name)`: loaded when the
    * stored fingerprint+shape match the corpus (zero Spark jobs);
    * EXTENDED when the corpus grew append-only (stored codebooks kept,
    * only new files encoded + appended, drift-guarded); trained +
    * persisted otherwise. */
  def pqIndex(emb: DataFrame, warehouse: String, name: String,
              m: Int = 16, k: Int = 16, iters: Int = 3)
      : (Pq.PqIndex, IndexOutcome) = {
    val spark = emb.sparkSession
    val sigs = Pq.fileSignatures(emb)
    val fp = Pq.fingerprintOf(sigs)
    val want = Map[String, Long]("m" -> m, "k" -> k, "iters" -> iters)
    def retrain(driftFallback: Boolean): (Pq.PqIndex, IndexOutcome) = {
      val cb = Pq.train(emb, m, k, iters)
      val dist = meanDistortion(sampleVectors(emb), cb)
      val loc = persist(Pq.encodeWithNorm(emb, cb), warehouse, name, Seq.empty,
        _ => tag(spark, new java.io.File(warehouse, name).toString, "pq", fp,
          want, sigs, dist, cb, None))
      (Pq.PqIndex(cb, loc), IndexOutcome.Trained(driftFallback))
    }
    loadTag(spark, warehouse, name) match {
      case Some((loc, j)) if str(j, "kind") == "pq" && str(j, "fp") == fp &&
          shapeOf(j) == want =>
        (Pq.PqIndex(cbOf(j \ "cb"), loc), IndexOutcome.Loaded)
      case Some((loc, j)) if str(j, "kind") == "pq" && shapeOf(j) == want &&
          filesOf(j).exists(st => appendedFiles(st, sigs).isDefined) =>
        val newPaths = appendedFiles(filesOf(j).get, sigs).get
        val cb = cbOf(j \ "cb")
        val newRows = newRowsFrame(spark, emb, newPaths)
        val newDist = meanDistortion(sampleVectors(newRows), cb)
        if (driftExceeded(newDist, dbl(j, "dist"))) retrain(driftFallback = true)
        else {
          TxLog.append(alignedToTable(spark, loc, Pq.encodeWithNorm(newRows, cb)),
            loc, commitTag = Some(tag(spark, loc, "pq", fp, want, sigs,
              dbl(j, "dist").getOrElse(newDist), cb, None)))
          (Pq.PqIndex(cb, loc), IndexOutcome.Extended(newPaths.size))
        }
      case _ => retrain(driftFallback = false)
    }
  }

  /** The persisted IVF×PQ index for `(warehouse, name)` — same contract
    * as [[pqIndex]]; the code table keeps its cell partitioning, so a
    * loaded OR extended index probes with directory-level pruning
    * intact (appends assign new vectors to cells under the stored
    * centroids with the training pass's exact rule). */
  def ivfPqIndex(emb: DataFrame, warehouse: String, name: String,
                 nCells: Int = 16, m: Int = 16, k: Int = 256, iters: Int = 3)
      : (IvfPq.IvfPqIndex, IndexOutcome) = {
    val spark = emb.sparkSession
    val sigs = Pq.fileSignatures(emb)
    val fp = Pq.fingerprintOf(sigs)
    val want = Map[String, Long](
      "nCells" -> nCells, "m" -> m, "k" -> k, "iters" -> iters)
    def retrain(driftFallback: Boolean): (IvfPq.IvfPqIndex, IndexOutcome) = {
      val built = IvfPq.buildIndex(emb, nCells, m, k, iters)
      val cents = built.centroids.sortBy(_._1).map(_._2)
      // drift baseline over RESIDUALS — the quantity the codebooks encode
      val dist = meanDistortion(
        sampleVectors(IvfPq.residualFrame(
          Ivf.assignExpr(Cosine.prepared(emb), built.centroids), cents)),
        built.cb)
      val codes = spark.read.parquet(built.codesPath)
      val loc = persist(codes, warehouse, name, Seq("cell"),
        _ => tag(spark, new java.io.File(warehouse, name).toString, "ivfpq",
          fp, want, sigs, dist, built.cb, Some(cents)))
      (IvfPq.IvfPqIndex(built.cb, built.centroids, loc),
        IndexOutcome.Trained(driftFallback))
    }
    loadTag(spark, warehouse, name) match {
      case Some((loc, j)) if str(j, "kind") == "ivfpq" && str(j, "fp") == fp &&
          shapeOf(j) == want =>
        (IvfPq.IvfPqIndex(cbOf(j \ "cb"), centroidsOf(j \ "centroids"), loc),
          IndexOutcome.Loaded)
      case Some((loc, j)) if str(j, "kind") == "ivfpq" && shapeOf(j) == want &&
          filesOf(j).exists(st => appendedFiles(st, sigs).isDefined) =>
        val newPaths = appendedFiles(filesOf(j).get, sigs).get
        val idx = IvfPq.IvfPqIndex(cbOf(j \ "cb"), centroidsOf(j \ "centroids"), loc)
        val cents = idx.centroids.sortBy(_._1).map(_._2)
        val newRows = newRowsFrame(spark, emb, newPaths)
        val newDist = meanDistortion(
          sampleVectors(IvfPq.residualFrame(
            Ivf.assignExpr(Cosine.prepared(newRows), idx.centroids), cents)),
          idx.cb)
        if (driftExceeded(newDist, dbl(j, "dist"))) retrain(driftFallback = true)
        else {
          TxLog.append(
            alignedToTable(spark, loc, IvfPq.encodeNewRows(newRows, idx)),
            loc, commitTag = Some(tag(spark, loc, "ivfpq", fp, want, sigs,
              dbl(j, "dist").getOrElse(newDist), idx.cb, Some(cents))))
          (idx, IndexOutcome.Extended(newPaths.size))
        }
      case _ => retrain(driftFallback = false)
    }
  }
}
