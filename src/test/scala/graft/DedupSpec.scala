package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, IncrementalDedup}
import graft.similarity.Cosine
import graft.text.TextOps

class DedupSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf)

  test("incremental dedup: matches history AND earlier batches via the growing index") {
    import spark.implicits._
    val idxPath = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val idx = "graft_spec_lsh_index"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    IncrementalDedup.initIndex(corpus, idx, idxPath)
    // batch 1: 10 duplicates corpus doc 1; 11 duplicates 10 (intra-batch)
    val b1 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      (12L, "seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    val r1 = IncrementalDedup.dedupBatch(b1, corpus, idx)
      .select("new_doc", "matched_doc").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == Set((10L, 1L), (11L, 1L), (11L, 10L)))
    // batch 2: 20 duplicates doc 1's content — the index must now also
    // surface batch-1 docs 10 and 11 as matches (the append grew it)
    val b2 = Seq((20L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val r2 = IncrementalDedup.dedupBatch(b2, corpus.unionByName(b1), idx)
      .select("new_doc", "matched_doc").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r2 == Set((20L, 1L), (20L, 10L), (20L, 11L)))
    // unique docs never match; the index holds bands for every doc seen
    assert(spark.table(idx).select("doc_id").distinct().count() == 6L)
  }

  test("incremental dedup: the candidate join never shuffles the index side") {
    import spark.implicits._
    // force SMJ so bucketing (not broadcast) decides the plan shape
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val idxPath = java.nio.file.Files.createTempDirectory("graft_idxplan").toString
      val idx = "graft_spec_lsh_index_plan"
      val corpus = (0L until 50L)
        .map(i => (i, s"corpus document $i body ${i * 7} filler ${i % 5} tail"))
        .toDF("doc_id", "text")
      IncrementalDedup.initIndex(corpus, idx, idxPath)
      val batch = Seq((100L, "corpus document 3 body 21 filler 3 tail"))
        .toDF("doc_id", "text")
      val cands = IncrementalDedup.candidatesVsIndex(spark,
        IncrementalDedup.bands(batch), batch.select("doc_id"), idx)
      val plan = cands.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      // exactly ONE hash exchange: the batch side shuffles into the
      // index's bucket layout; the index scan itself is never shuffled —
      // round 4's txlog-backed index re-shuffled O(corpus × bands) rows
      // on every batch
      assert(exchanges == 1,
        s"expected 1 exchange (batch side only), found $exchanges in:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"index scan should be bucketed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("streaming incremental dedup: stream order decides orientation, index grows per commit") {
    import spark.implicits._
    val idxPath = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val idx = "graft_spec_lsh_index_stream"
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    IncrementalDedup.initIndex(corpus, idx, idxPath)
    // batch 1 carries doc 10 (dup of 1); batch 2 carries doc 5 — a
    // SMALLER id arriving LATER: stream order, not id order, must make
    // it the new_doc against both 1 and 10
    val b1 = Seq((10L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val b2 = Seq((5L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val pairs = graft.streaming.StreamIncrementalDedup
      .run(spark, corpus, Seq(b1, b2), idx)
      .select("new_doc", "matched_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (5L, 1L), (5L, 10L)),
      s"got $pairs — batch-2 doc 5 must be new_doc vs batch-1 doc 10")
    assert(spark.table(idx).select("doc_id").distinct().count() == 3L)
  }

  test("streaming incremental dedup: replayed micro-batch is exactly-once") {
    import spark.implicits._
    val idxPath = java.nio.file.Files.createTempDirectory("graft_ridx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_rout").toString
    val idx = "graft_spec_lsh_index_replay"
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    IncrementalDedup.initIndex(corpus, idx, idxPath)
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "unique content nothing like the rest at all")).toDF("doc_id", "text")
    def pairCount = spark.read.parquet(outDir)
      .select("new_doc", "matched_doc", "jaccard").count()
    def bandCount = spark.table(idx).count()
    // first delivery
    IncrementalDedup.applyBatchExactlyOnce(batch, corpus, idx, 3L, outDir)
    val (p1, b1) = (pairCount, bandCount)
    assert(p1 == 1L, s"expected the one (10,1) pair, got $p1")
    // crash AFTER both effects, BEFORE checkpoint commit → foreachBatch
    // re-delivers the same batch with the same batchId
    IncrementalDedup.applyBatchExactlyOnce(batch, corpus, idx, 3L, outDir)
    assert(pairCount == p1, "replay duplicated emitted pairs")
    assert(bandCount == b1, "replay double-appended index bands")
    // crash BETWEEN effects: bands landed but the pair partition was lost
    // (pair write and index append straddle the failure) — the replay
    // must regenerate identical pairs even though the index now already
    // holds the batch's own bands
    val pairDir = java.nio.file.Paths.get(outDir, "batch=3")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(pairDir).iterator().asScala.toSeq.reverseIterator
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    IncrementalDedup.applyBatchExactlyOnce(batch, corpus, idx, 3L, outDir)
    assert(pairCount == p1, "replay after partial crash lost or duplicated pairs")
    assert(bandCount == b1, "replay after partial crash double-appended bands")
    val pair = spark.read.parquet(outDir).select("new_doc", "matched_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pair == Set((10L, 1L)))
  }

  test("streaming incremental dedup: all-empty stream yields a schema-stable empty frame") {
    import spark.implicits._
    val idxPath = java.nio.file.Files.createTempDirectory("graft_eidx").toString
    val idx = "graft_spec_lsh_index_empty"
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    IncrementalDedup.initIndex(corpus, idx, idxPath)
    val none = corpus.limit(0)
    val out = graft.streaming.StreamIncrementalDedup
      .run(spark, corpus, Seq(none, none), idx)
    assert(out.columns.toSeq == Seq("new_doc", "matched_doc", "jaccard"))
    assert(out.count() == 0L)
  }

  test("exact dedup: keepers unique, copies sum to corpus size") {
    val d = Dedup.exact(docs)
    assert(d.select("keeper").distinct().count() == d.count())
    assert(d.agg(sum("n_copies")).collect()(0).getLong(0) == docs.count())
  }

  test("minhash estimate tracks exact jaccard on candidates") {
    val cands = Dedup.minhashCandidates(docs, minEstJaccard = 0.2)
    val exact = Dedup.ngramJaccard(docs, minJaccard = 0.0)
    val joined = cands.join(exact, Seq("doc_a", "doc_b"))
    assert(joined.count() > 0, "no near-dup candidates found")
    // signature estimate within 0.35 of exact jaccard for every candidate
    val worst = joined
      .agg(max(abs(col("est_jaccard") - col("jaccard")))).collect()(0).getDouble(0)
    assert(worst < 0.35, s"minhash estimate off by $worst")
  }

  test("minhash finds the planted near-duplicate pairs") {
    // pairs with exact jaccard >= 0.8 must all surface as candidates
    val strong = Dedup.ngramJaccard(docs, minJaccard = 0.0)
      .filter(col("jaccard") >= 0.8)
    val cands = Dedup.minhashCandidates(docs, minEstJaccard = 0.5)
    val missed = strong.join(cands, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(strong.count() > 0)
    assert(missed == 0, s"$missed strong pairs missed by LSH")
  }

  test("simhash: near-identical docs collide, hamming small") {
    val sh = Dedup.simhashCandidates(docs, maxHamming = 10)
    val strong = Dedup.ngramJaccard(docs, minJaccard = 0.0)
      .filter(col("jaccard") >= 0.95).select("doc_a", "doc_b")
    val found = strong.join(sh, Seq("doc_a", "doc_b")).count()
    assert(found >= strong.count() / 2,
      s"simhash found $found of ${strong.count()} strong pairs")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val p = Cosine.nearDupPairs(Tables.embeddings(spark, sf), 0.4, exactAllPairs = true)
    assert(p.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(p.filter(col("sim") < 0.4).count() == 0)
  }

  test("minhash signature re-attachment carries no forced broadcast") {
    // With auto-broadcast off, the signature joins must degrade to
    // shuffle joins — proving the former broadcast(sigs) HINT is gone and
    // the strategy is stats-driven (broadcast only when actually small).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.minhashCandidates(docs)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "signature relation is still force-broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rolling fingerprint is deterministic across evaluations") {
    val a = TextOps.rollingFingerprint(docs).select("doc_id", "rolling_hash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = TextOps.rollingFingerprint(docs).select("doc_id", "rolling_hash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
