package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *   - the CODEBOOKS (+ IVF centroids) are driver metadata, stored as
  *     JSON in a commit TAG riding the same log — index data and index
  *     metadata move atomically, nothing lives in JVM state;
  *   - the key is the corpus CONTENT FINGERPRINT (file paths + lengths
  *     + mtimes) plus the index shape: a regenerated corpus or changed
  *     (m, k, nCells) misses and retrains; a match loads with ZERO
  *     Spark jobs (catalog file + commit tags are driver file reads,
  *     numbers round-trip exactly through JSON — bit-identical probes).
  *
  * Loading costs one catalog read + one commit-tag listing per call —
  * driver metadata, no data I/O; no JVM cache sits in front, so a
  * fresh session (or process) exercises the same path the first one
  * does. */
object AnnIndexStore {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val TagPrefix = "annindex:"

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

  private def tag(kind: String, fp: String, shape: Map[String, Long],
                  cb: Pq.Codebooks,
                  centroids: Option[Seq[Seq[Double]]]): String = {
    val fields = List[(String, JValue)](
      "kind" -> JString(kind), "fp" -> JString(fp),
      "shape" -> JObject(shape.toList.map { case (k, v) => k -> (JInt(v): JValue) }),
      "cb" -> cbJson(cb)) ++
      centroids.map(cs => "centroids" ->
        (JArray(cs.toList.map(c => JArray(c.toList.map(JDouble(_): JValue)))): JValue))
    TagPrefix + JsonMethods.compact(JsonMethods.render(JObject(fields)))
  }

  /** Latest annindex tag of the cataloged table `name`, parsed —
    * None when the table is absent or carries no index tag. */
  private def loadTag(spark: SparkSession, warehouse: String, name: String)
      : Option[(String, JValue)] =
    GraftCatalog.entries(warehouse).find(_.name == name).flatMap { e =>
      if (!TxLog.exists(spark, e.location)) None
      else TxLog.commitTags(spark, e.location)
        .filter(_._2.startsWith(TagPrefix))
        .sortBy(_._1).lastOption
        .map { case (_, t) =>
          (e.location, JsonMethods.parse(t.stripPrefix(TagPrefix)))
        }
    }

  private def str(j: JValue, field: String): String =
    j \ field match { case JString(s) => s; case _ => "" }

  private def shapeOf(j: JValue): Map[String, Long] = j \ "shape" match {
    case JObject(fs) => fs.collect {
      case (k, JInt(v)) => k -> v.toLong
      case (k, JLong(v)) => k -> v
    }.toMap
    case _ => Map.empty
  }

  private def persist(codes: DataFrame, warehouse: String, name: String,
                      partitionCols: Seq[String], indexTag: String): String = {
    val loc = new java.io.File(warehouse, name).toString
    TxLog.overwrite(codes, loc, partitionCols, overwriteSchema = true)
    // the tag rides an empty tagged append: metadata commits atomically
    // into the SAME log as the code table it describes
    TxLog.append(codes.limit(0), loc, commitTag = Some(indexTag))
    GraftCatalog.register(warehouse, name, loc)
    loc
  }

  /** The persisted PQ index for `(warehouse, name)`: loaded when the
    * stored fingerprint+shape match the corpus (zero Spark jobs),
    * trained + persisted otherwise. Returns (index, loadedFromCatalog). */
  def pqIndex(emb: DataFrame, warehouse: String, name: String,
              m: Int = 16, k: Int = 16, iters: Int = 3): (Pq.PqIndex, Boolean) = {
    val spark = emb.sparkSession
    val fp = Pq.contentFingerprint(emb)
    val want = Map[String, Long]("m" -> m, "k" -> k, "iters" -> iters)
    loadTag(spark, warehouse, name) match {
      case Some((loc, j)) if str(j, "kind") == "pq" && str(j, "fp") == fp &&
          shapeOf(j) == want =>
        (Pq.PqIndex(cbOf(j \ "cb"), loc), true)
      case _ =>
        val cb = Pq.train(emb, m, k, iters)
        val loc = persist(Pq.encodeWithNorm(emb, cb), warehouse, name,
          Seq.empty, tag("pq", fp, want, cb, None))
        (Pq.PqIndex(cb, loc), false)
    }
  }

  /** The persisted IVF×PQ index for `(warehouse, name)` — same contract
    * as [[pqIndex]]; the code table keeps its cell partitioning, so a
    * loaded index probes with directory-level pruning intact. */
  def ivfPqIndex(emb: DataFrame, warehouse: String, name: String,
                 nCells: Int = 16, m: Int = 16, k: Int = 256, iters: Int = 3)
      : (IvfPq.IvfPqIndex, Boolean) = {
    val spark = emb.sparkSession
    val fp = Pq.contentFingerprint(emb)
    val want = Map[String, Long](
      "nCells" -> nCells, "m" -> m, "k" -> k, "iters" -> iters)
    loadTag(spark, warehouse, name) match {
      case Some((loc, j)) if str(j, "kind") == "ivfpq" && str(j, "fp") == fp &&
          shapeOf(j) == want =>
        val cents = (j \ "centroids") match {
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
        (IvfPq.IvfPqIndex(cbOf(j \ "cb"), cents, loc), true)
      case _ =>
        val built = IvfPq.buildIndex(emb, nCells, m, k, iters)
        val codes = spark.read.parquet(built.codesPath)
        val loc = persist(codes, warehouse, name, Seq("cell"),
          tag("ivfpq", fp, want, built.cb,
            Some(built.centroids.sortBy(_._1).map(_._2))))
        (IvfPq.IvfPqIndex(built.cb, built.centroids, loc), false)
    }
  }
}
