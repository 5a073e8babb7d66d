package graft

import org.apache.spark.sql.functions._

import graft.similarity.Cosine

class SimilaritySpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf)

  test("int8 quantization: codes in range, reconstruction tight, constant vectors safe") {
    import spark.implicits._
    import graft.similarity.Quantize
    val vecs = Seq(
      (0L, Seq(1.0f, -2.0f, 3.0f, 0.5f)),
      (1L, Seq(0.25f, 0.25f, 0.25f, 0.25f)), // constant: qscale 0
      (2L, Seq(-1.0f, 1.0f, -1.0f, 1.0f))).toDF("vec_id", "embedding")
    val dq = Quantize.dequantized(Quantize.quantized(vecs))
      .select("vec_id", "qmin", "qscale", "codes", "dq")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getSeq[Byte](3), r.getSeq[Double](4))).toMap
    // reconstruction error per element <= qscale/2 (+ rounding epsilon)
    Seq(0L, 2L).foreach { id =>
      val (_, scale, codes, rec) = dq(id)
      assert(codes.forall(c => c >= -128 && c <= 127))
      val orig = Map(0L -> Seq(1.0, -2.0, 3.0, 0.5), 2L -> Seq(-1.0, 1.0, -1.0, 1.0))(id)
      orig.zip(rec).foreach { case (o, r) =>
        assert(math.abs(o - r) <= scale / 2 + 1e-9, s"vec $id: $o vs $r")
      }
    }
    // constant vector: all codes equal, dequant returns the constant
    val (qmin1, qscale1, codes1, rec1) = dq(1L)
    assert(qscale1 == 0.0 && codes1.distinct.size == 1)
    assert(rec1.forall(v => math.abs(v - 0.25) < 1e-9), s"got $rec1 qmin=$qmin1")
    // on the real corpus: quantized ranking tracks exact ranking closely
    val exact = Cosine.bruteTopK(emb, nQueries = 4, k = 10)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("se"))
    val quant = Quantize.topK(emb, nQueries = 4, k = 10)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("sq"))
    val err = exact.join(quant, Seq("query_id", "neighbor_id"))
      .agg(max(abs(col("sq") - col("se")))).collect()(0).getDouble(0)
    assert(err <= 0.02, s"quantized sim error $err")
  }

  test("stratified sample: integer-exact quotas, deterministic, true subset") {
    import graft.etl.Splits
    val ev = Tables.events(spark, sf).select("event_id", "event_type")
    val sampled = Splits.stratifiedSample(ev, "event_type", "event_id", 200).cache()
    val got = sampled.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> (r.getLong(1) * 200 + 999) / 1000).toMap
    assert(got == want, s"quotas: $got vs $want")
    // subset + deterministic under repartitioning
    assert(sampled.join(ev, Seq("event_id", "event_type"), "left_anti").count() == 0)
    val again = Splits.stratifiedSample(ev.repartition(7), "event_type", "event_id", 200)
    assert(sampled.select("event_id").exceptAll(again.select("event_id")).isEmpty)
    // column names that need quoting survive (no raw SQL interpolation)
    val spaced = ev.withColumnRenamed("event_type", "event type")
    val s2 = Splits.stratifiedSample(spaced, "event type", "event_id", 200)
    assert(s2.count() == sampled.count())
  }

  test("brute-force topk: k rows per query, sims descending, self excluded") {
    val t = Cosine.bruteTopK(emb, nQueries = 8, k = 10).cache()
    assert(t.groupBy("query_id").count().filter(col("count") =!= 10).count() == 0)
    assert(t.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val perQuery = t.orderBy("query_id", "rank").collect()
      .groupBy(_.getAs[Long]("query_id"))
    perQuery.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    t.unpersist()
  }

  test("lsh topk is a subset-ranking consistent with brute force") {
    val brute = Cosine.bruteTopK(emb, 8, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Cosine.lshTopK(emb, 8, 10)
    assert(lsh.count() > 0, "LSH returned no candidates at all")
    // every LSH hit's (query, neighbor) sim must equal the brute-force sim
    // when present there; and recall should be non-trivial
    val hits = Cosine.lshTopK(emb, 8, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = hits.count(brute.contains).toDouble / brute.size
    info(f"LSH recall vs brute force: $recall%.2f")
    assert(recall > 0.1, f"recall $recall too low")
  }

  test("cosine of a vector with itself is 1") {
    val p = Cosine.prepared(emb).limit(5)
    val self = p.as("a").join(p.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select((Cosine.dot(col("a.v"), col("b.v")) /
        (col("a.norm") * col("b.norm"))).as("sim"))
    assert(self.filter(abs(col("sim") - 1.0) > 1e-12).count() == 0)
  }

  test("IVF index partitions the corpus deterministically; topk clears recall floor") {
    val idx1 = graft.similarity.Ivf.index(emb, k = 8, iters = 2)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val idx2 = graft.similarity.Ivf.index(emb, k = 8, iters = 2)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(idx1.sameElements(idx2), "IVF training is not run-deterministic")
    assert(idx1.length == emb.count(), "every vector must land in exactly one cell")
    val brute = Cosine.bruteTopK(emb, 8, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.similarity.Ivf.topK(emb, 8, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.count(brute.contains).toDouble / brute.size
    info(f"IVF recall vs brute force: $recall%.2f")
    assert(recall >= 0.2, f"IVF recall $recall below floor")
  }

  test("block-partitioned nearDupPairs matches an in-test exact kernel") {
    // tiny maxBlockRows forces MANY blocks — every block-pair code path
    // (same-block, cross-block, least/greatest normalization) is exercised
    val got = Cosine.nearDupPairs(emb, 0.35, maxBlockRows = 16, exactAllPairs = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val want = (for {
      (ida, va) <- vecs; (idb, vb) <- vecs if ida < idb
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      sim = dot / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      if sim >= 0.35
    } yield (ida, idb, math.rint(sim * 1e4) / 1e4)).toSeq
    assert(got.length == want.length,
      s"pair count ${got.length} != exact ${want.length}")
    got.zip(want.sortBy(p => (p._1, p._2))).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && math.abs(g._3 - w._3) <= 1e-9, s"$g != $w")
    }
  }

  test("quantized pre-filter: candidates are a proven superset of exact pairs, and prune") {
    import graft.similarity.Quantize
    val t = 0.35
    val qp = Quantize.pairPrepared(emb)
    val cands = Cosine.quantCandidates(qp, t, maxBlockRows = 16).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
                 math.max(r.getLong(0), r.getLong(1)))).toSet
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    var total = 0L
    val exact = (for {
      (ida, va) <- vecs; (idb, vb) <- vecs if ida < idb
      _ = { total += 1 }
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      sim = dot / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      if sim >= t
    } yield (ida, idb)).toSet
    val missed = exact -- cands
    assert(missed.isEmpty,
      s"pre-filter dropped ${missed.size} qualifying pairs: ${missed.take(5)}")
    val pruneRatio = 1.0 - cands.size.toDouble / total
    info(f"candidates ${cands.size} of $total pairs (pruned ${pruneRatio * 100}%.1f%%)")
    // the filter must actually filter — a pass-through would silently
    // revert the float work to O(n²)
    assert(cands.size.toDouble / total < 0.5,
      s"pre-filter kept ${cands.size} of $total pairs — not pruning")
  }

  test("quant_dot: integer dot over unsigned levels, length mismatch throws") {
    import spark.implicits._
    val df = Seq((Seq[Byte](-128, 0, 127), Seq[Byte](-128, 0, 127)))
      .toDF("a", "b")
    // levels: (-128,0,127)+128 = (0,128,255) -> dot = 0 + 128*128 + 255*255
    val got = df.select(graft.functions.QuantDotFunction
      .quant_dot(spark, col("a"), col("b")).as("d")).head().getLong(0)
    assert(got == 128L * 128 + 255L * 255)
    val bad = Seq((Seq[Byte](1, 2), Seq[Byte](1, 2, 3))).toDF("a", "b")
    intercept[Exception] {
      bad.select(graft.functions.QuantDotFunction
        .quant_dot(spark, col("a"), col("b"))).collect()
    }
  }

  test("nearDupPairs plan has no driver-side materialization of the corpus") {
    val plan = Cosine.nearDupPairs(emb, 0.4, exactAllPairs = true).queryExecution.optimizedPlan
    // the old scale-killer surfaced as LogicalRDD (collect + parallelize
    // of the full corpus); the block path must be a pure declarative plan
    val rdds = plan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l }
    assert(rdds.isEmpty, "corpus was collected to the driver and re-parallelized")
  }

  test("cosine_sim guards: zero-norm yields null, length mismatch throws") {
    val f = graft.functions.GraftFunctions.cosine_sim(spark, _: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column)
    val df = spark.sql(
      "SELECT array(cast(0.0 as double), cast(0.0 as double)) AS z, " +
      "array(cast(1.0 as double), cast(2.0 as double)) AS a, " +
      "array(cast(1.0 as double)) AS short")
    assert(df.select(f(col("z"), col("a")).as("s")).collect()(0).isNullAt(0))
    val e = intercept[Exception] {
      df.select(f(col("a"), col("short")).as("s")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null && t.getMessage.contains("length mismatch")))
  }
}
