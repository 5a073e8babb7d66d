package graft

import org.apache.spark.sql.functions._

import graft.acid.TxLog

/** Round-10 laws: the PQ ADC scan (lookup-table similarity ==
  * reconstructed cosine, train-once index store), the StreamMv replay
  * clamp (crash + intervening commits), SCD-2 replay semantics and
  * one-pass accounting, the legacy-numRecords DV husk fix, the
  * sign-LSH embedding near-dup (== its exact all-pairs twin on
  * duplicate-bearing corpora), the merge-on-read MERGE (== its
  * copy-on-write twin), Misra–Gries heavy-hitter bounds, generated
  * partition columns (rule-derived partition filters), the pHash
  * hamming-band near-dup (== its O(n²) popcount twin), CONVERT/ANALYZE
  * (metadata-only absorb, stats restore skipping), and the streaming
  * as-of join (== the batch as-of, exact under out-of-order arrival). */
class Round10Spec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // --------------------------------------------------------------- PQ ADC

  test("pq ADC: lookup-table similarity equals reconstructed cosine exactly") {
    import graft.similarity.{Cosine, Pq}
    val emb = Tables.embeddings(spark, sf)
    val m = 16; val k = 16
    val cb = Pq.train(emb, m, k, iters = 2)
    val subd = cb.head.head.size
    // driver-side model of both paths over every (query, corpus) pair:
    // ADC = sum of LUT lookups; reference = cosine(q, concat centroids)
    val vecs = Cosine.prepared(emb).select("vec_id", "v", "norm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val codes = Pq.encode(emb, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val queries = vecs.filter(_._1 < 4)
    for ((qid, qv, qnorm) <- queries) {
      val lut = cb.zipWithIndex.map { case (cs, j) =>
        cs.map(c => (0 until subd).map(i => qv(j * subd + i) * c(i)).sum)
      }
      for ((nid, _, _) <- vecs.take(50) if nid != qid) {
        val cd = codes(nid)
        val recon = (0 until m).flatMap(j => cb(j)(cd(j))).toArray
        val rnorm = math.sqrt(recon.map(x => x * x).sum)
        val refSim = (0 until qv.length).map(i => qv(i) * recon(i)).sum /
          (qnorm * rnorm)
        val adcSim = (0 until m).map(j => lut(j)(cd(j))).sum / (qnorm * rnorm)
        assert(math.abs(adcSim - refSim) < 1e-9,
          s"ADC sim diverges from reconstructed cosine for ($qid, $nid)")
      }
    }
  }

  test("pq index store: train-once lifecycle, probes are pure read path") {
    import graft.similarity.Pq
    val emb = Tables.embeddings(spark, sf)
    val i1 = Pq.indexFor(emb, s"test:$sf", iters = 2)
    val i2 = Pq.indexFor(emb, s"test:$sf", iters = 2)
    assert(i1 eq i2) // second call hit the store — no retrain, no re-encode
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(i1.codesPath)))
    // the persisted code table carries codes + precomputed |x-hat| only
    val codeTable = spark.read.parquet(i1.codesPath)
    assert(codeTable.columns.toSeq === Seq("vec_id", "codes", "rnorm"))
    // two probes through the same key agree row-for-row
    val r1 = Pq.topK(emb, 4, 5, iters = 2, indexKey = Some(s"test:$sf")).collect()
    val r2 = Pq.topK(emb, 4, 5, iters = 2, indexKey = Some(s"test:$sf")).collect()
    assert(r1.toSeq === r2.toSeq)
  }

  test("ivfpq: cell-partitioned code table, train-once store, refine is exact") {
    import graft.similarity.{Cosine, IvfPq}
    val emb = Tables.embeddings(spark, sf)
    val i1 = IvfPq.indexFor(emb, s"test:$sf", iters = 2)
    val i2 = IvfPq.indexFor(emb, s"test:$sf", iters = 2)
    assert(i1 eq i2) // second call hit the store
    // the code table is laid out one directory per IVF cell — the probe's
    // cell IN (...) predicate is directory-level partition pruning
    val cellDirs = new java.io.File(i1.codesPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    // every emitted (query, neighbor) sim equals the EXACT cosine (the
    // refine stage re-ranks on full precision)
    val res = IvfPq.topK(emb, nQueries = 4, kNeighbors = 5, iters = 2,
        indexKey = Some(s"test:$sf"))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val brute = Cosine.bruteTopK(emb, nQueries = 4, k = 1000000)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    assert(res.join(brute, Seq("query_id", "neighbor_id"))
      .filter(col("sim") =!= col("bsim")).isEmpty)
    // neighbors come only from probed cells: with nprobe == nCells the
    // scan covers everything, so a full-probe run must dominate recall
    val full = IvfPq.topK(emb, nQueries = 4, kNeighbors = 5, nprobe = 16,
      iters = 2).select("query_id", "neighbor_id")
    assert(full.count() === 20L)
  }

  test("ivfpq residual ADC: offset + lookups == cosine of (centroid + reconstructed residual)") {
    import graft.similarity.{Cosine, IvfPq, Pq}
    val emb = Tables.embeddings(spark, sf)
    val idx = IvfPq.buildIndex(emb, iters = 2)
    val m = idx.cb.size
    val subd = idx.cb.head.head.size
    val cellOf = idx.centroids.toMap
    val codeRows = spark.read.parquet(idx.codesPath)
      .select("vec_id", "codes", "rnorm", "cell").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1).toArray, r.getDouble(2), r.getInt(3)))
      .toMap
    val vecs = Cosine.prepared(emb).select("vec_id", "v", "norm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    for ((qid, qv, qnorm) <- vecs.filter(_._1 < 3)) {
      val lut = idx.cb.zipWithIndex.map { case (cs, j) =>
        cs.map(c => (0 until subd).map(i => qv(j * subd + i) * c(i)).sum)
      }
      for ((nid, _, _) <- vecs.take(40) if nid != qid) {
        val (cd, rnorm, cell) = codeRows(nid)
        val cent = cellOf(cell)
        // x-hat = centroid + reconstructed residual
        val xhat = (0 until m).flatMap(j =>
          idx.cb(j)(cd(j)).zipWithIndex.map { case (x, i) => cent(j * subd + i) + x })
        val xn = math.sqrt(xhat.map(x => x * x).sum)
        assert(math.abs(rnorm - xn) < 1e-9, s"rnorm != |x-hat| for $nid")
        val off = qv.indices.map(i => qv(i) * cent(i)).sum
        val adc = (off + (0 until m).map(j => lut(j)(cd(j))).sum) / (qnorm * rnorm)
        val ref = qv.indices.map(i => qv(i) * xhat(i)).sum / (qnorm * xn)
        assert(math.abs(adc - ref) < 1e-9, s"residual ADC diverges for ($qid, $nid)")
      }
    }
  }

  // ------------------------------------------------------ StreamMv replay

  test("streaming MV: replay with INTERVENING base commits cannot double-apply") {
    import spark.implicits._
    import graft.acid.{MaterializedView, MvSpec}
    import graft.streaming.{ChangeFeedStream, StreamMv}
    val base = tmp("smv10_base"); val mv = tmp("smv10_view") + "/v"
    val spec = MvSpec(Seq("grp"), Seq("amount"))
    TxLog.overwrite(Seq(
      (1L, "a", 10.0), (2L, "b", 5.0)).toDF("id", "grp", "amount"), base) // v1
    val cursor = ChangeFeedStream.cursor(spark, base,
      MaterializedView.initialize(spark, base, mv, spec))
    val replayFrom = cursor.nextVersion
    TxLog.append(Seq((3L, "a", 7.0)).toDF("id", "grp", "amount"), base)   // v2
    assert(StreamMv.pump(spark, base, mv, spec, cursor) === 1)
    // CRASH: the external cursor checkpoint is lost, AND a new base
    // commit lands before the consumer restarts. The restarted cursor's
    // first poll would span [replayFrom .. v3] — with v2 already folded.
    TxLog.append(Seq((4L, "b", 3.0)).toDF("id", "grp", "amount"), base)   // v3
    val replayCursor = ChangeFeedStream.cursor(spark, base, replayFrom)
    StreamMv.pump(spark, base, mv, spec, replayCursor)
    val v = TxLog.read(spark, mv)
    val r = MaterializedView.compute(TxLog.read(spark, base), spec)
    assert(v.exceptAll(r).isEmpty && r.exceptAll(v).isEmpty,
      "replayed cursor with intervening commits corrupted the view")
  }

  // --------------------------------------------------------- SCD-2 replay

  test("scd2: replayed batch no-ops with (0,0); real out-of-order batch fails loudly") {
    import spark.implicits._
    import graft.acid.Scd2
    val t = tmp("scd10")
    val key = Seq("id"); val attrs = Seq("seg")
    Scd2.initialize(Seq((1L, "x"), (2L, "y")).toDF("id", "seg"),
      t, key, attrs, "2024-01-01 00:00:00")
    val b1 = Seq((1L, "CHANGED"), (2L, "y")).toDF("id", "seg")
    assert(Scd2.apply(spark, b1, t, key, attrs, "2024-02-01 00:00:00") === (1L, 1L))
    val after = TxLog.read(spark, t).collect().toSet
    // replay of the SAME batch at the SAME ts: no-op, not an exception —
    // the re-delivered rows equal the versions the first delivery opened
    assert(Scd2.apply(spark, b1, t, key, attrs, "2024-02-01 00:00:00") === (0L, 0L))
    assert(TxLog.read(spark, t).collect().toSet === after)
    // a batch with REAL changes at a non-advancing ts is out-of-order CDC
    val bad = Seq((1L, "AGAIN"), (2L, "y")).toDF("id", "seg")
    intercept[IllegalArgumentException] {
      Scd2.apply(spark, bad, t, key, attrs, "2024-02-01 00:00:00")
    }
    // time moves forward: applies cleanly and chains a third version
    assert(Scd2.apply(spark, bad, t, key, attrs, "2024-03-01 00:00:00") === (1L, 1L))
    val dim = TxLog.read(spark, t)
    assert(dim.filter(col("id") === 1L).count() === 3L)
    assert(dim.filter(col("is_current") && col("id") === 1L)
      .select("seg").collect().head.getString(0) === "AGAIN")
  }

  // --------------------------------------------------- streaming SCD-2

  test("streamScd2: streamed chain equals batch application; widened replay no-ops") {
    import spark.implicits._
    import graft.acid.Scd2
    import graft.streaming.{ChangeFeedStream, StreamScd2}
    val src = tmp("sscd_src"); val dimS = tmp("sscd_dim_stream")
    val dimB = tmp("sscd_dim_batch")
    val key = Seq("id"); val attrs = Seq("seg", "bal")
    val t0 = "2024-01-01 00:00:00"
    val tsOf = Map(2L -> "2024-02-01 00:00:00", 3L -> "2024-03-01 00:00:00")
    val init = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("id", "seg", "bal")
    TxLog.overwrite(init, src)                                          // v1
    Scd2.initialize(init, dimS, key, attrs, t0)
    Scd2.initialize(init, dimB, key, attrs, t0)
    val cursor = ChangeFeedStream.cursor(spark, src, 2L)
    // batch 1: change key 1, insert key 4
    val b1 = Seq((1L, "x2", 11.0), (4L, "w", 40.0)).toDF("id", "seg", "bal")
    TxLog.merge(b1, src, key)                                           // v2
    val s1 = StreamScd2.pump(spark, src, dimS, key, attrs, cursor, tsOf)
    assert(s1.batches === 1)
    Scd2.apply(spark, b1, dimB, key, attrs, tsOf(2L))
    // batch 2: change key 1 AGAIN and key 2
    val b2 = Seq((1L, "x3", 12.0), (2L, "y2", 21.0)).toDF("id", "seg", "bal")
    TxLog.merge(b2, src, key)                                           // v3
    StreamScd2.pump(spark, src, dimS, key, attrs, cursor, tsOf)
    Scd2.apply(spark, b2, dimB, key, attrs, tsOf(3L))
    // the streamed dimension equals the directly batch-applied one
    val streamed = TxLog.read(spark, dimS)
    val batch = TxLog.read(spark, dimB)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed SCD-2 chain diverged from batch application")
    // stale cursor re-polls v2..v3 as ONE widened batch at tsOf(3): the
    // latest-state reduction + state-based change detection must no-op
    val census = TxLog.read(spark, dimS).collect().toSet
    val replay = StreamScd2.pump(spark, src, dimS, key, attrs,
      ChangeFeedStream.cursor(spark, src, 2L), tsOf)
    assert(replay.closed === 0L && replay.inserted === 0L)
    assert(TxLog.read(spark, dimS).collect().toSet === census)
    // key 1 carries the 3-version chain with the mid state closed at t2
    assert(TxLog.read(spark, dimS).filter(col("id") === 1L).count() === 3L)
  }

  // ------------------------------------------------- merge-on-read UPDATE

  test("updateWithDv: O(changed rows) commit — originals intact, post-images appended") {
    val t = tmp("udv")
    TxLog.overwrite(spark.range(0, 1000)
      .select(col("id"), (col("id") % 10).cast("double").as("v"))
      .repartition(2), t)                                               // v1
    val before = TxLog.livePaths(spark, t)
    val stats = TxLog.updateWithDv(spark, t, col("id") < 10,
      Map("v" -> lit(99.0)))                                            // v2
    val after = TxLog.livePaths(spark, t)
    // the 10-row update on 1000 rows rewrote NO original data file —
    // the commit is DV sidecars + one appended post-image file
    assert(before.subsetOf(after), "an original file was rewritten or removed")
    assert(stats.filesAdded > 0 && (after -- before).size === stats.filesAdded)
    val cur = TxLog.read(spark, t)
    assert(cur.count() === 1000L)
    assert(cur.filter(col("id") < 10).select("v").distinct().collect()
      .map(_.getDouble(0)).toSeq === Seq(99.0))
    assert(cur.filter(col("id") >= 10 && col("v") === 99.0).isEmpty)
    // time travel below the commit reads every pre-update value
    assert(TxLog.read(spark, t, versionAsOf = Some(1L))
      .filter(col("id") < 10 && col("v") === 99.0).isEmpty)
    // CDF carries both images
    val feed = TxLog.readChangeFeed(spark, t, fromVersion = 2L)
    assert(feed.filter(col("_change_type") === "update_preimage").count() === 10L)
    assert(feed.filter(col("_change_type") === "update_postimage" &&
      col("v") === 99.0).count() === 10L)
    // a second update hitting the POST-IMAGE file unions its DV chain
    TxLog.updateWithDv(spark, t, col("id") < 5 && col("v") === 99.0,
      Map("v" -> lit(77.0)))                                            // v3
    val cur2 = TxLog.read(spark, t)
    assert(cur2.count() === 1000L)
    assert(cur2.filter(col("v") === 77.0).count() === 5L)
    assert(cur2.filter(col("v") === 99.0).count() === 5L)
    // OPTIMIZE reads through the DVs and materializes them away
    TxLog.optimize(spark, t)
    assert(TxLog.dvInfo(spark, t).isEmpty)
    assert(TxLog.read(spark, t).count() === 1000L)
    assert(TxLog.read(spark, t).filter(col("v") === 77.0).count() === 5L)
  }

  test("mergeWithDv: upsert commits DVs + appended images, matches merge semantics") {
    import spark.implicits._
    val t = tmp("mdv"); val twin = tmp("mdv_twin")
    val init = spark.range(0, 1000)
      .select(col("id"), (col("id") % 10).cast("double").as("v"))
      .repartition(2)
    TxLog.overwrite(init, t); TxLog.overwrite(init, twin)               // v1
    // source: update ids 0-9, insert 2000-2004, delete-when v < 0 never
    val src = spark.range(0, 10).select(col("id"), lit(99.0).as("v"))
      .unionByName(spark.range(2000, 2005).select(col("id"), lit(7.0).as("v")))
    val before = TxLog.livePaths(spark, t)
    val stats = TxLog.mergeWithDv(src, t, Seq("id"))                    // v2
    TxLog.merge(src, twin, Seq("id"))
    // merge-on-read and copy-on-write merges agree row-for-row
    val a = TxLog.read(spark, t); val b = TxLog.read(spark, twin)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // ...but the DV merge rewrote NO original file
    assert(before.subsetOf(TxLog.livePaths(spark, t)))
    assert(stats.filesAdded > 0)
    // CDF parity with the copy-on-write merge's classification
    val feed = TxLog.readChangeFeed(spark, t, fromVersion = 2L)
    assert(feed.filter(col("_change_type") === "update_preimage").count() === 10L)
    assert(feed.filter(col("_change_type") === "update_postimage").count() === 10L)
    assert(feed.filter(col("_change_type") === "insert").count() === 5L)
    // deleteWhen drops matched rows instead of appending their image
    TxLog.mergeWithDv(spark.range(0, 5).select(col("id"), lit(-1.0).as("v")),
      t, Seq("id"), deleteWhen = Some(col("v") < 0))                    // v3
    assert(TxLog.read(spark, t).count() === 1000L) // 1005 - 5
    assert(TxLog.read(spark, t).filter(col("id") < 5).isEmpty)
    // a pure-insert batch (no matched keys) still appends
    TxLog.mergeWithDv(spark.range(3000, 3003).select(col("id"), lit(1.0).as("v")),
      t, Seq("id"))                                                     // v4
    assert(TxLog.read(spark, t).count() === 1003L)
  }

  // ------------------------------------------------- DV-aware OPTIMIZE

  test("optimizeDv: rewrites only files above the DV ratio, content unchanged") {
    import spark.implicits._
    val t = tmp("odv")
    // two partition files: grp=a holds ids 0..49, grp=b holds 50..99
    TxLog.overwrite(spark.range(0, 100)
      .select(col("id"), when(col("id") < 50, "a").otherwise("b").as("grp")),
      t, Seq("grp"))                                                    // v1
    // heavy delete in a (40/50 = 0.8), light in b (1/50 = 0.02)
    TxLog.deleteWithDv(spark, t, col("id") < 40 || col("id") === 50L)   // v2
    val dvBefore = TxLog.dvInfo(spark, t).toMap
    assert(dvBefore.size === 2)
    val contentBefore = TxLog.read(spark, t).collect().toSet
    val before = TxLog.livePaths(spark, t)
    val stats = TxLog.optimizeDv(spark, t, maxDvRatio = 0.3)            // v3
    assert(stats.filesRewritten === 1, "only the DV-heavy file rewrites")
    val dvAfter = TxLog.dvInfo(spark, t).toMap
    // the heavy file's DV is gone (materialized away); the light one is
    // byte-identical — untouched sidecar, untouched data file
    assert(dvAfter.size === 1)
    assert(dvAfter.head._2 === 1L)
    assert(before.intersect(TxLog.livePaths(spark, t))
      .contains(dvAfter.head._1))
    assert(TxLog.read(spark, t).collect().toSet === contentBefore)
    // below-threshold table: a second pass is a no-op (no commit)
    val v = TxLog.currentVersion(spark, t)
    assert(TxLog.optimizeDv(spark, t, maxDvRatio = 0.3) ===
      TxLog.MergeStats(0, TxLog.fileCount(spark, t), 0))
    assert(TxLog.currentVersion(spark, t) === v)
  }

  // ----------------------------------------------- DV legacy numRecords

  test("deleteWithDv: fully-deleted legacy file (numRecords unknown) leaves no husk") {
    import spark.implicits._
    val t = tmp("dvlegacy")
    TxLog.overwrite(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v")
      .coalesce(1), t)
    // simulate a legacy log: strip the recorded row count from the add
    val logFile = new java.io.File(s"$t/_txlog").listFiles()
      .filter(_.getName.endsWith(".json")).minBy(_.getName)
    val patched = scala.io.Source.fromFile(logFile).mkString
      .replaceAll(""""numRecords":\d+""", "\"numRecords\":-1")
    java.nio.file.Files.write(logFile.toPath,
      patched.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // delete EVERY row: the file must be removed outright (footer read
    // supplies the unknown count), not re-added as a zero-row DV husk
    TxLog.deleteWithDv(spark, t, lit(true))
    assert(TxLog.read(spark, t).isEmpty)
    assert(TxLog.livePaths(spark, t).isEmpty,
      "fully-deleted legacy file survived as an empty husk")
  }

  // ------------------------------------------- LSH embedding near-dup

  test("nearDupPairsAnn: equals the exact all-pairs answer on a duplicate-bearing corpus") {
    import spark.implicits._
    import graft.similarity.Cosine
    val dim = Cosine.Dim
    // deterministic well-mixed directions, pairwise far apart (a raw
    // affine mix of (seed, i) leaves adjacent seeds ~0.98-similar —
    // real borderline pairs LSH only probabilistically finds, which is
    // not the law under test)
    def vec(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + 1L)
      Array.fill(dim)(r.nextFloat() * 2.0f - 1.0f)
    }
    val base = (0L until 40L).map(k => (k, vec(k)))
    val scaled = base.filter(_._1 % 4 == 0)
      .map { case (k, v) => (1000L + k, v.map(x => x * 1.5f)) }
    val exactCopies = base.filter(_._1 % 10 == 0)
      .map { case (k, v) => (2000L + k, v) }
    val corpus = (base ++ scaled ++ exactCopies).toDF("vec_id", "embedding")
    val ann = Cosine.nearDupPairsAnn(corpus, 0.9)
      .orderBy("vec_a", "vec_b").collect().toSeq
    val exact = Cosine.nearDupPairs(corpus, 0.9, exactAllPairs = true)
      .collect().toSeq
    // LSH candidates + exact verify == gated O(n²) twin, row for row
    assert(ann == exact)
    assert(ann.nonEmpty, "law is vacuous: no duplicate pairs in corpus")
    // sign-identical copies are found with certainty: scaled copy,
    // byte-identical copy, and the copy-copy pair all present
    val ids = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((0L, 1000L)) && ids.contains((0L, 2000L)) &&
           ids.contains((1000L, 2000L)))
    // precision 1.0 by construction: nothing below threshold emitted
    assert(ann.forall(_.getDouble(2) >= 0.9))
  }

  test("dedup_embed_ann registry: exact census — full planted recall, zero strays") {
    val row = SparkEntry.dedupEmbedAnn(spark, sf).collect().head
    assert(row.getAs[Long]("n_planted") > 0)
    assert(row.getAs[Boolean]("recall_exact"), "planted scaled copy missed")
    assert(row.getAs[Boolean]("no_stray_pairs"), "sub-threshold pair emitted")
    assert(row.getAs[Double]("min_sim") == 1.0)
  }

  // ----------------------------------------------- importance sampling

  test("importanceSample: exact keep rule, deterministic under repartitioning") {
    val docs = Tables.documents(spark, sf)
    val kept = graft.etl.Mixture.importanceSample(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // driver re-derivation of the keep rule from the published contract
    val q = graft.text.TextOps.qualityScore(docs)
      .select("doc_id", "quality_score").collect()
    val expect = q.filter { r =>
      val id = r.getLong(0)
      ((id * 1103515245L + 12345L) % 2147483648L) % 1000000L <
        math.floor(r.getDouble(1) * 500000.0).toLong
    }.map(_.getLong(0)).toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < q.length, "law is vacuous")
    // same documents whatever the partitioning — no RNG state anywhere
    val kept2 = graft.etl.Mixture.importanceSample(docs.repartition(13))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 === kept)
  }

  // ---------------------------------------------------- streaming as-of

  test("streamAsof: streamed result equals the batch as-of row-for-row") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select("user_id", "ts")
    val streamed = graft.streaming.StreamAsOf.runAsOfStream(spark, purchases, signups)
      .orderBy("event_id").collect().toSeq
    val batch = graft.analytics.Temporal.asofBackward(purchases,
        signups.select(col("user_id"), col("ts"), col("ts").as("signup_ts")),
        "user_id", "ts", Seq("signup_ts"))
      .select("event_id", "user_id", "ts", "signup_ts")
      .orderBy("event_id").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // exactly-once per left row
    assert(streamed.map(_.getLong(0)).distinct.size === streamed.size)
    // both match and no-match (null) paths exercised
    assert(streamed.exists(!_.isNullAt(3)) && streamed.exists(_.isNullAt(3)))
  }

  test("streamAsof: a right arriving a BATCH after its left still matches within the allowance") {
    import spark.implicits._
    import graft.streaming.StreamAsOf
    import StreamAsOf.AsOfEvent
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val base = tmp("sasof_ooo"); val dir = s"$base/src"
    // batch 1: the left plus an older right; the BETTER right arrives in
    // batch 2, below the left's event time but inside the 1h allowance
    Seq(AsOfEvent(1L, ts("2024-01-01 10:00:00"), 100L, true),
        AsOfEvent(1L, ts("2024-01-01 08:00:00"), -1L, false))
      .toDF().write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = StreamAsOf.asofStateful(
        spark.readStream.schema(schema).parquet(dir).as[AsOfEvent],
        delay = "1 hour")
      .toDF().writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .format("parquet").option("path", s"$base/out").start()
    try {
      q.processAllAvailable() // watermark → 09:00; left held
      Seq(AsOfEvent(1L, ts("2024-01-01 09:30:00"), -1L, false)).toDF()
        .write.mode("append").parquet(dir)
      q.processAllAvailable() // out-of-order right accepted (9:30 > 9:00)
      Seq("2024-03-01 00:00:00", "2024-04-01 00:00:00").foreach { far =>
        Seq(AsOfEvent(Long.MinValue, ts(far), -99L, true)).toDF()
          .write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
    } finally q.stop()
    val out = spark.read.parquet(s"$base/out")
      .filter(col("user_id") =!= Long.MinValue).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 100L)
    // matched the LATE-arriving 09:30 right, not the batch-1 08:00 one
    assert(out.head.getTimestamp(3) === ts("2024-01-01 09:30:00"))
  }

  // ---------------------------------------------------- convert + analyze

  test("convert: in-place metadata-only absorb; analyze restores skipping") {
    import spark.implicits._
    val t = tmp("conv")
    val src = spark.range(0, 10000)
      .select(col("id"), (col("id") % 3).cast("int").as("p"),
        (col("id") * 2).cast("double").as("v"))
      .repartitionByRange(4, col("id"))
    src.write.partitionBy("p").mode("overwrite").parquet(t)
    val rawContent = spark.read.parquet(t).collect().toSet
    val n = TxLog.convert(spark, t, Seq("p"))
    assert(n > 0)
    // same rows through the txlog read; no file moved or rewritten
    assert(TxLog.read(spark, t).collect().toSet === rawContent)
    // a second convert is loud
    intercept[IllegalArgumentException] { TxLog.convert(spark, t, Seq("p")) }
    // fresh convert has no stats: an id predicate selects every file...
    val (t1, idx1) = TxLog.readWithSkipInfo(spark, t)
    t1.filter(col("id") < 100).count()
    val (sel1, tot1) = idx1.lastListing.get
    assert(sel1 === tot1)
    // ...but partition pruning (log metadata) works already
    t1.filter(col("p") === 1).count()
    assert(idx1.lastListing.get._1 < tot1)
    // analyze stats every file once; a second analyze finds nothing stale
    assert(TxLog.analyze(spark, t) === n)
    assert(TxLog.analyze(spark, t) === 0)
    val (t2, idx2) = TxLog.readWithSkipInfo(spark, t)
    assert(t2.filter(col("id") < 100).count() === 100L)
    val (sel2, tot2) = idx2.lastListing.get
    assert(sel2 < tot2, "stats did not restore data skipping")
    // analyze was metadata-only: time travel below it reads the same rows
    assert(TxLog.read(spark, t, versionAsOf = Some(1L)).collect().toSet === rawContent)
    // the converted table is a full citizen: transactional append works
    // (inferred schema order: data cols, then partition cols)
    TxLog.append(Seq((100000L, 1.0, 1)).toDF("id", "v", "p"), t)
    assert(TxLog.read(spark, t).count() === 10001L)
  }

  // ------------------------------------------------- pHash near-dup pairs

  test("hammingBandPairs: equals the exact all-pairs popcount twin") {
    import spark.implicits._
    // sf0.01 corpus (carries a real cross-content phash collision) +
    // planted byte-identical copies — the banded search must equal the
    // O(n²) twin INCLUDING pairs the content census cannot see
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 4 === 0)
      .select((-(col("doc_id") + 1)).as("doc_id"), col("text"))
    val corpus = docs.unionByName(planted)
    val hashed = graft.multimodal.BinaryColumns.toMixedImageBlobs(corpus)
      .mapPartitions { it =>
        val h = new graft.multimodal.Codecs.Handle
        it.map(b => (b.doc_id, graft.multimodal.Phash.aHash64(h.decode(b.payload))))
      }.toDF("doc_id", "phash")
    val banded = graft.dedup.Dedup.hammingBandPairs(hashed, "phash", 3,
        exact = true)
      .collect().toSeq
    val exact = hashed.as("a").join(hashed.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(banded == exact)
    assert(exact.nonEmpty, "law is vacuous: no near pairs in corpus")
    // ...and it found a pair the md5-content census does NOT contain
    // (distinct texts, colliding hashes) — the operator is not just
    // exact-dup detection in disguise
    val ck = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(banded.exists(r => ck(r.getLong(0)) != ck(r.getLong(1))))
  }

  test("hammingBandPairs: finds a genuinely near (hamming-2) image pair") {
    import spark.implicits._
    import graft.multimodal.{Phash, Ppm}
    // 16×16 half-bright rasters: flip exactly grid cells 0 and 32 —
    // brightness census unchanged, so the grid mean is unchanged and the
    // hashes differ in exactly those 2 bits
    def img(flip: Boolean): Ppm.Image = {
      val w = 16; val h = 16
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val cell = (y / 2) * 8 + (x / 2)
        val bright =
          if (flip && cell == 0) false
          else if (flip && cell == 32) true
          else cell < 32
        val v: Byte = if (bright) 0xFF.toByte else 0x00
        val i = (y * w + x) * 3
        px(i) = v; px(i + 1) = v; px(i + 2) = v
      }
      Ppm.Image(w, h, px)
    }
    val a = Phash.aHash64(img(flip = false))
    val b = Phash.aHash64(img(flip = true))
    assert(Phash.hamming(a, b) === 2)
    val pairs = graft.dedup.Dedup.hammingBandPairs(
        Seq((1L, a), (2L, b), (3L, ~a)).toDF("doc_id", "phash"), "phash", 3,
        exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq((1L, 2L, 2L))) // near pair found; far pairs absent
    // the exactness guarantee is a hard gate: a threshold the 4-band
    // layout cannot guarantee errors instead of silently dropping pairs
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.hammingBandPairs(
        Seq((1L, a)).toDF("doc_id", "phash"), "phash", 10, exact = true)
    }
  }

  test("mm_phash_dedup registry: census nontrivial and fully recalled") {
    val row = SparkEntry.mmPhashDedup(spark, sf).collect().head
    assert(row.getAs[Long]("n_content_pairs") > 0)
    assert(row.getAs[Boolean]("all_content_dups_found"))
  }

  // ------------------------------------- generated partition columns

  test("generated cols: write computes, rule derives partition filter, prune fires") {
    import spark.implicits._
    val t = tmp("gencol")
    val rows = (0 until 1000).map { i =>
      (i.toLong,
       java.sql.Timestamp.valueOf(f"2024-01-${1 + i % 20}%02d 10:00:00"),
       i * 1.0)
    }
    val df = rows.toDF("id", "ts", "v") // no event_date column anywhere
    TxLog.overwrite(df, t, partitionCols = Seq("event_date"),
      generatedCols = Map("event_date" -> "date(ts)"))
    val (table, idx) = TxLog.readWithSkipInfo(spark, t)
    assert(table.columns.contains("event_date"), "write did not compute the column")
    // the query mentions ONLY ts; the optimizer must conjoin a derived
    // event_date predicate (visible in the optimized plan)...
    val q = table.filter(col("ts") >= lit("2024-01-05 00:00:00") &&
                         col("ts") <  lit("2024-01-08 00:00:00"))
    val optimizedFilters = q.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    assert(optimizedFilters.exists(_.references.exists(_.name == "event_date")),
      s"no derived event_date conjunct in: ${q.queryExecution.optimizedPlan}")
    // ...and the file index must RECEIVE it as a partition filter
    val got = q.agg(count(lit(1))).collect().head.getLong(0)
    assert(got === rows.count { case (_, ts, _) =>
      !ts.before(java.sql.Timestamp.valueOf("2024-01-05 10:00:00")) &&
        ts.before(java.sql.Timestamp.valueOf("2024-01-08 00:00:00")) })
    assert(idx.lastPartitionFilters.exists(_.contains("event_date")),
      s"partition pruning never saw event_date: ${idx.lastPartitionFilters}")
    val (sel, tot) = idx.lastListing.get
    assert(sel < tot, "no partitions pruned")
    // derived filter is a weakening: whole-table scan unchanged
    assert(TxLog.read(spark, t).count() === 1000L)
  }

  test("generated cols: append inherits, hand-written wrong values rejected, year kind") {
    import spark.implicits._
    val t = tmp("gencol2")
    val ts = java.sql.Timestamp.valueOf("2023-06-15 12:00:00")
    TxLog.overwrite(Seq((1L, ts, 1.0)).toDF("id", "ts", "v"), t,
      partitionCols = Seq("yr"), generatedCols = Map("yr" -> "year(ts)"))
    // append carries no yr — computed from table meta
    TxLog.append(Seq((2L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 2.0))
      .toDF("id", "ts", "v"), t)
    val byYear = TxLog.read(spark, t).groupBy("yr").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byYear === Map(2023 -> 1L, 2024 -> 1L))
    // a provided yr that disagrees with year(ts) must be rejected loudly
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((3L, ts, 3.0, 1999)).toDF("id", "ts", "v", "yr"), t)
    }
    // year derivation: ts bound becomes a yr bound the index sees
    val (table, idx) = TxLog.readWithSkipInfo(spark, t)
    table.filter(col("ts") >= lit("2024-01-01 00:00:00")).count()
    assert(idx.lastPartitionFilters.exists(_.contains("yr")))
    // unsupported spec shapes are rejected at declaration
    intercept[IllegalArgumentException] {
      TxLog.overwrite(Seq((1L, ts, 1.0)).toDF("id", "ts", "v"), tmp("gencol3"),
        partitionCols = Seq("m"), generatedCols = Map("m" -> "month(ts)"))
    }
  }

  // ------------------------------------------- Misra–Gries heavy hitters

  test("mg_sketch: survivor superset + underestimate bounds hold across partitionings") {
    import spark.implicits._
    // Zipf-ish synthetic stream: item i appears 2000/(i+1) times —
    // deterministic, known exact counts
    val occurrences = (0 until 50).flatMap(i =>
      Seq.fill(2000 / (i + 1))(s"tok$i"))
    val n = occurrences.size.toLong
    val k = 20
    for (parts <- Seq(1, 7, 32)) {
      // shuffle deterministically so partitions see interleaved items
      val rnd = new scala.util.Random(42)
      val rows = rnd.shuffle(occurrences).grouped(10).map(g => Tuple1(g)).toSeq
      val df = spark.createDataset(rows).toDF("toks").repartition(parts)
      val m = df.agg(graft.functions.MisraGries
          .mg_sketch(spark, col("toks"), k).as("mg"))
        .collect().head.getMap[String, Long](0)
      val exact = occurrences.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      // every item with freq > N/(k+1) survives
      exact.filter(_._2 > n / (k + 1)).keys.foreach(t =>
        assert(m.contains(t), s"$t (freq ${exact(t)}) missing at parts=$parts"))
      // every estimate is a lower bound within N/(k+1) of truth
      m.foreach { case (t, est) =>
        assert(est <= exact(t), s"$t overestimated")
        assert(exact(t) - est <= n / (k + 1) + 1, s"$t underestimate too deep")
      }
    }
  }

  test("frequentTokens: two-pass MG answer equals the exact histogram slice") {
    val docs = graft.Tables.documents(spark, sf)
    val got = graft.text.FrequentTokens.frequentTokens(docs).collect().toSeq
    val toks = docs.select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
    val naive = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
      .crossJoin(toks.agg(count(lit(1)).as("n_tokens")))
      .filter(col("freq") * 200 >= col("n_tokens"))
      .orderBy(col("freq").desc, col("tok"))
      .collect().toSeq
    assert(got == naive)
    assert(got.nonEmpty, "law is vacuous: no heavy hitters at sf")
  }
}
