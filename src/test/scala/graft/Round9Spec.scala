package graft

import org.apache.spark.sql.functions._

import graft.acid.{MergeClause, TxLog}
import MergeClause._

/** Round-9 laws: conditional multi-clause MERGE — clause precedence,
  * by-source semantics, file-granular rewrite, CDF, and the guardrails
  * (duplicate source keys, key-column SET). Corpus-level agreement is
  * the delta_merge_conditional oracle's job. */
class Round9Spec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  import org.apache.spark.sql.DataFrame
  private def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("mergeConditional: first-match-wins across every clause group") {
    import spark.implicits._
    val t = tmp("mc-prec")
    TxLog.overwrite(Seq(
      (1L, "a", 10.0),   // matched, hits upd1 AND del2 -> upd1 wins
      (2L, "a", 5.0),    // matched, hits only del2 -> deleted
      (3L, "a", 1.0),    // matched, no clause -> untouched
      (4L, "a", 100.0),  // by-source, hits bupd AND bdel -> bupd wins
      (5L, "a", 2.0)     // by-source, hits only bdel -> deleted
    ).toDF("id", "grp", "v"), t)
    val src = Seq(
      (1L, "a", 50.0), (2L, "a", 50.0), (3L, "a", 50.0),
      (6L, "a", 9.0),   // unmatched, insert cond fails -> dropped
      (7L, "a", 90.0)   // unmatched, insert applies (second clause values)
    ).toDF("id", "grp", "v")
    TxLog.mergeConditional(src, t, Seq("id"), Seq(
      MatchedUpdate(Some("t.v >= 10"), Map("v" -> "t.v + s.v")),
      MatchedDelete(Some("t.v >= 5")), // overlaps upd at v>=10: upd wins
      NotMatchedInsert(Some("s.v >= 100"),
        Some(Map("v" -> "s.v * 10"))), // never fires here
      NotMatchedInsert(Some("s.v >= 50"), None), // INSERT *
      NotMatchedBySourceUpdate(Some("t.v >= 50"), Map("v" -> "t.v + 1")),
      NotMatchedBySourceDelete(None))) // unconditioned: bupd shadows it
    assert(rows(TxLog.read(spark, t)) === Set(
      (1L, "a", 60.0),   // upd1: 10 + 50 (column-level, grp untouched)
      (3L, "a", 1.0),    // matched, no clause
      (4L, "a", 101.0),  // bupd
      (7L, "a", 90.0)))  // INSERT * from the SECOND insert clause
  }

  test("mergeConditional: insert VALUES map beats INSERT * when its clause wins") {
    import spark.implicits._
    val t = tmp("mc-vals")
    TxLog.overwrite(Seq((1L, "a", 1.0)).toDF("id", "grp", "v"), t)
    TxLog.mergeConditional(
      Seq((2L, "a", 100.0)).toDF("id", "grp", "v"), t, Seq("id"), Seq(
        NotMatchedInsert(Some("s.v >= 100"), Some(Map("v" -> "s.v * 10"))),
        NotMatchedInsert(None, None)))
    assert(rows(TxLog.read(spark, t)) === Set((1L, "a", 1.0), (2L, "a", 1000.0)))
  }

  test("mergeConditional: guardrails — dup source keys and key-column SET") {
    import spark.implicits._
    val t = tmp("mc-guard")
    TxLog.overwrite(Seq((1L, "a", 1.0)).toDF("id", "grp", "v"), t)
    val dup = Seq((2L, "a", 1.0), (2L, "a", 2.0)).toDF("id", "grp", "v")
    val e1 = intercept[IllegalArgumentException] {
      TxLog.mergeConditional(dup, t, Seq("id"),
        Seq(NotMatchedInsert(None, None)))
    }
    assert(e1.getMessage.contains("duplicate"))
    val e2 = intercept[IllegalArgumentException] {
      TxLog.mergeConditional(Seq((1L, "a", 1.0)).toDF("id", "grp", "v"),
        t, Seq("id"),
        Seq(MatchedUpdate(None, Map("id" -> "t.id + 1"))))
    }
    assert(e2.getMessage.contains("key column"))
  }

  test("mergeConditional: file-granular — untouched partitions never rewrite") {
    import spark.implicits._
    val t = tmp("mc-files")
    // 3 partitions -> 3 files; source touches only grp=a keys, and the
    // by-source condition only selects grp=b rows
    TxLog.overwrite(Seq(
      (1L, "a", 10.0), (2L, "b", 3.0), (3L, "c", 10.0)
    ).toDF("id", "grp", "v"), t, partitionCols = Seq("grp"))
    val stats = TxLog.mergeConditional(
      Seq((1L, "a", 5.0)).toDF("id", "grp", "v"), t, Seq("id"), Seq(
        MatchedUpdate(None, Map("v" -> "t.v + s.v")),
        NotMatchedBySourceDelete(Some("t.v < 5"))))
    // grp=c holds no matched key and no by-source-satisfying row: its
    // file must survive the commit byte-identical
    assert(stats.filesRewritten === 2 && stats.filesTotalBefore === 3)
    assert(rows(TxLog.read(spark, t).select("id", "grp", "v")) ===
      Set((1L, "a", 15.0), (3L, "c", 10.0)))
  }

  test("mergeConditional: CDF carries every clause outcome") {
    import spark.implicits._
    val t = tmp("mc-cdf")
    TxLog.overwrite(Seq(
      (1L, "a", 10.0), (2L, "a", 1.0), (3L, "a", 7.0)
    ).toDF("id", "grp", "v"), t)
    TxLog.mergeConditional(
      Seq((1L, "a", 5.0), (4L, "a", 50.0)).toDF("id", "grp", "v"),
      t, Seq("id"), Seq(
        MatchedUpdate(None, Map("v" -> "s.v")),
        NotMatchedInsert(None, None),
        NotMatchedBySourceDelete(Some("t.v < 5")),
        NotMatchedBySourceUpdate(None, Map("v" -> "t.v * 2"))))
    val feed = TxLog.readChangeFeed(spark, t, fromVersion = 2L)
      .select("id", "_change_type", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(feed === Set(
      (1L, "update_preimage", 10.0), (1L, "update_postimage", 5.0),
      (2L, "delete", 1.0),
      (3L, "update_preimage", 7.0), (3L, "update_postimage", 14.0),
      (4L, "insert", 50.0)))
  }

  // ------------------------------------------------------ shared tokenizer

  /** Fixture shared verbatim with tools/tokenizer_parity.py, which runs
    * the SAME rows through DuckDB's regexp_split_to_array with the same
    * pattern: the two files together prove both engines tokenize
    * punctuated / multi-script / extra-whitespace text identically. */
  private val TokenizerFixture: Seq[(String, Seq[String])] = Seq(
    "Hello, world! It's 2024-08." ->
      Seq("hello", "world", "it", "s", "2024", "08"),
    "  multiple   spaces\tand\nnewlines  " ->
      Seq("multiple", "spaces", "and", "newlines"),
    "Café naïve Zürich ÉLAN" -> Seq("café", "naïve", "zürich", "élan"),
    "日本語のテキストと English mixed" ->
      Seq("日本語のテキストと", "english", "mixed"),
    "Привет, мир! Ёлка" -> Seq("привет", "мир", "ёлка"),
    "!!! ... ---" -> Seq(),
    "foo_bar baz-qux" -> Seq("foo", "bar", "baz", "qux"),
    "a1b2 3c" -> Seq("a1b2", "3c"),
    "" -> Seq())

  test("tokenizer: punctuation, multi-script, and whitespace-fold fixture") {
    import spark.implicits._
    val got = TokenizerFixture.map(_._1).toDF("text")
      .select(graft.text.TextOps.tokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0).toSeq)
    got.zip(TokenizerFixture).foreach { case (g, (in, want)) =>
      assert(g === want, s"tokens of ${in.take(30)}")
    }
    // the native shingle/min-hash kernels share the exact tokenization
    TokenizerFixture.foreach { case (in, want) =>
      assert(graft.functions.TextShingles.tokenize(in.toLowerCase).toSeq
        === want, s"JVM tokenize of ${in.take(30)}")
    }
  }

  test("tokenizer: zero-token docs flow through quality and counts safely") {
    import spark.implicits._
    val docs = Seq((1L, "Real text, here!"), (2L, "!!! ..."), (3L, ""))
      .toDF("doc_id", "text")
    val q = graft.text.TextOps.qualityScore(docs)
      .select("doc_id", "n_tokens", "stopword_ratio").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(q(2L) === ((0L, 0.0)))   // all punctuation: 0 tokens, ratio 0
    val c = graft.text.TextOps.tokenCounts(docs)
      .select("doc_id", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c === Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
  }

  // ------------------------------------------------------ deletion vectors

  private def dataFilesOnDisk(table: String): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    val root = new java.io.File(table)
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(walk)
      else if (f.getName.endsWith(".parquet") &&
               !f.getPath.contains("_txlog")) out += f.getPath
    walk(root)
    out.toSet
  }

  test("deletion vectors: a small delete commits O(deleted), not a rewrite") {
    import spark.implicits._
    val t = tmp("dvt_small")
    TxLog.overwrite((1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v"), t)
    val dataBefore = TxLog.livePaths(spark, t)
    val diskBefore = dataFilesOnDisk(t)
    val stats = TxLog.deleteWithDv(spark, t, col("id") <= 10L)
    // the data file set is IDENTICAL — no file rewritten, none added
    assert(TxLog.livePaths(spark, t) === dataBefore)
    assert(stats.filesAdded === 0 && stats.filesRewritten >= 1)
    // on disk: only dv- sidecars appeared, no new data- parquet
    val newFiles = dataFilesOnDisk(t) -- diskBefore
    assert(newFiles.nonEmpty && newFiles.forall(p =>
      p.contains("/dv-") || p.contains("/cdc-")), s"unexpected: $newFiles")
    val dv = TxLog.dvInfo(spark, t)
    assert(dv.map(_._2).sum === 10L)
    // logical read subtracts the DV rows
    assert(TxLog.read(spark, t).agg(count(lit(1)), sum(col("id")))
      .collect()(0).getLong(0) === 90L)
    assert(TxLog.read(spark, t).filter(col("id") <= 10L).isEmpty)
  }

  test("deletion vectors: repeat deletes union; full files drop out") {
    import spark.implicits._
    val t = tmp("dvt_union")
    // two files via partition: grp=a (ids 1-50), grp=b (ids 51-60)
    TxLog.overwrite(
      ((1L to 50L).map((_, "a")) ++ (51L to 60L).map((_, "b")))
        .toDF("id", "grp"), t, partitionCols = Seq("grp"))
    TxLog.deleteWithDv(spark, t, col("id") <= 5L)        // v2: 5 rows of a
    TxLog.deleteWithDv(spark, t, col("id").between(6L, 8L)) // v3: 3 more
    assert(TxLog.dvInfo(spark, t).map(_._2).sum === 8L)
    assert(TxLog.read(spark, t).count() === 52L)
    // v2 snapshot sees only the first DV
    assert(TxLog.read(spark, t, versionAsOf = Some(2L)).count() === 55L)
    // v1 snapshot reads pre-delete rows
    assert(TxLog.read(spark, t, versionAsOf = Some(1L)).count() === 60L)
    // delete ALL of grp=b: its file must be removed, not DV'd to empty
    TxLog.deleteWithDv(spark, t, col("grp") === "b")
    assert(TxLog.read(spark, t).count() === 42L)
    assert(!TxLog.livePaths(spark, t).exists(_.contains("grp=b")))
  }

  test("deletion vectors: CDF, optimize materialization, vacuum protection") {
    import spark.implicits._
    val t = tmp("dvt_cdf")
    TxLog.overwrite((1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"), t) // v1
    TxLog.deleteWithDv(spark, t, col("id") > 18L)                          // v2
    val feed = TxLog.readChangeFeed(spark, t, fromVersion = 2L, Some(2L))
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed === Set((19L, "delete"), (20L, "delete")))
    // copy-on-write UPDATE on the DV'd table reads THROUGH the DV (the
    // deleted rows are not resurrected, not updated) — and stays
    // file-granular: the untouched file KEEPS its DV
    TxLog.update(spark, t, col("id") === 1L, Map("v" -> lit(100.0)))       // v3
    assert(TxLog.read(spark, t).agg(sum(col("v"))).collect()(0)
      .getDouble(0) === (2L to 18L).map(_.toDouble).sum + 100.0)
    assert(TxLog.dvInfo(spark, t).nonEmpty)
    // OPTIMIZE rewrites the whole snapshot -> every DV materialized away
    TxLog.optimize(spark, t)                                               // v4
    assert(TxLog.dvInfo(spark, t).isEmpty)
    assert(TxLog.read(spark, t).count() === 18L)
    // vacuum retaining v2 keeps the sidecar (v2 still readable)...
    TxLog.overwrite((1L to 3L).map(i => (i, 0.0)).toDF("id", "v"), t)      // v5
    TxLog.vacuum(spark, t, retainVersion = 2L)
    assert(TxLog.read(spark, t, versionAsOf = Some(2L)).count() === 18L)
    // ...and vacuum past it reclaims dv sidecars with the data files
    TxLog.vacuum(spark, t, retainVersion = 5L)
    val leftover = dataFilesOnDisk(t).filter(_.contains("/dv-"))
    assert(leftover.isEmpty, s"dv sidecars survived vacuum: $leftover")
  }

  test("deletion vectors: shallow clone follows the source's DVs") {
    import spark.implicits._
    val src = tmp("dvt_clone_src"); val dst = tmp("dvt_clone_dst") + "/t"
    TxLog.overwrite((1L to 30L).map(i => (i, i * 1.0)).toDF("id", "v"), src)
    TxLog.deleteWithDv(spark, src, col("id") > 25L)
    TxLog.cloneShallow(spark, src, dst)
    assert(TxLog.read(spark, dst).count() === 25L)
    // a DV delete on the CLONE stays under the clone's root; the source
    // is untouched
    TxLog.deleteWithDv(spark, dst, col("id") === 1L)
    assert(TxLog.read(spark, dst).count() === 24L)
    assert(TxLog.read(spark, src).count() === 25L)
  }

  // -------------------------------------------------------- column mapping

  test("column mapping: rename is metadata-only and everything reads through") {
    import spark.implicits._
    val t = tmp("cmap_basic")
    TxLog.overwrite((1L to 40L).map(i => (i, i * 1.0, s"u$i"))
      .toDF("id", "amount", "who"), t)                                  // v1
    val before = TxLog.livePaths(spark, t)
    TxLog.renameColumn(spark, t, "amount", "fare")                      // v2
    assert(TxLog.livePaths(spark, t) === before) // zero files touched
    val cur = TxLog.read(spark, t)
    assert(cur.columns.toSeq === Seq("id", "fare", "who"))
    assert(cur.agg(sum(col("fare"))).collect()(0).getDouble(0) ===
      (1L to 40L).map(_.toDouble).sum)
    // time travel below the rename keeps the OLD name
    assert(TxLog.read(spark, t, versionAsOf = Some(1L)).columns.toSeq ===
      Seq("id", "amount", "who"))
    // writes after the rename land under the same physical layout and
    // read back mixed with pre-rename files
    TxLog.append(Seq((41L, 41.0, "u41")).toDF("id", "fare", "who"), t)  // v3
    assert(TxLog.read(spark, t).count() === 41L)
    assert(TxLog.read(spark, t).filter(col("fare") === 41.0).count() === 1L)
  }

  test("column mapping: data skipping survives a rename") {
    import spark.implicits._
    val t = tmp("cmap_skip")
    TxLog.overwrite(
      spark.range(1, 1001).select(col("id"), (col("id") * 2.0).as("amount"))
        .repartitionByRange(8, col("amount")), t)
    TxLog.renameColumn(spark, t, "amount", "fare")
    val (table, idx) = TxLog.readWithSkipInfo(spark, t)
    assert(table.filter(col("fare") < 20.0).count() === 9L)
    val (sel, tot) = idx.lastListing.get
    assert(sel < tot && tot === 8,
      s"renamed-column predicate should still skip files: $sel/$tot")
  }

  test("column mapping: drop hides without rewrite; stale-name evolve rejected") {
    import spark.implicits._
    val t = tmp("cmap_drop")
    TxLog.overwrite(Seq((1L, 1.0, "x"), (2L, 2.0, "y"))
      .toDF("id", "amount", "who"), t)
    val before = TxLog.livePaths(spark, t)
    TxLog.dropColumn(spark, t, "who")
    assert(TxLog.livePaths(spark, t) === before)
    assert(TxLog.read(spark, t).columns.toSeq === Seq("id", "amount"))
    // old snapshot still carries the column
    assert(TxLog.read(spark, t, versionAsOf = Some(1L)).columns.contains("who"))
    // schema evolution must NOT resurrect the dropped physical column
    val e = intercept[IllegalArgumentException] {
      TxLog.merge(Seq((3L, 3.0, "stale")).toDF("id", "amount", "who"),
        t, Seq("id"), evolveSchema = true)
    }
    assert(e.getMessage.contains("old files still"))
    // ...same for a renamed column's pre-rename home
    TxLog.renameColumn(spark, t, "amount", "fare")
    val e2 = intercept[IllegalArgumentException] {
      TxLog.merge(Seq((3L, 3.0, 9.9)).toDF("id", "fare", "amount"),
        t, Seq("id"), evolveSchema = true)
    }
    assert(e2.getMessage.contains("old files still"))
  }

  test("column mapping: copy-on-write ops and restore work through the map") {
    import spark.implicits._
    val t = tmp("cmap_cow")
    TxLog.overwrite((1L to 10L).map(i => (i, i * 1.0)).toDF("id", "amount"), t)
    TxLog.renameColumn(spark, t, "amount", "fare")                       // v2
    TxLog.update(spark, t, col("id") === 1L, Map("fare" -> lit(99.0)))   // v3
    TxLog.delete(spark, t, col("fare") > 9.5 && col("fare") < 11.0)      // v4: id 10
    assert(TxLog.read(spark, t).agg(sum(col("fare"))).collect()(0)
      .getDouble(0) === (2L to 9L).map(_.toDouble).sum + 99.0)
    // restore across the rename: v1 reads with its own (old) schema again
    TxLog.restore(spark, t, 1L)
    val restored = TxLog.read(spark, t)
    assert(restored.columns.toSeq === Seq("id", "amount"))
    assert(restored.count() === 10L)
  }

  // --------------------------------------------------------------- PQ ANN

  test("pq: codes are in range, training is deterministic, refine is exact") {
    import graft.similarity.{Cosine, Pq}
    val emb = Tables.embeddings(spark, sf)
    val cb1 = Pq.train(emb, m = 16, k = 16, iters = 2)
    val cb2 = Pq.train(emb, m = 16, k = 16, iters = 2)
    assert(cb1 === cb2) // hash seeds + DECIMAL means: bit-stable
    assert(cb1.size === 16 && cb1.forall(_.size === 16) &&
      cb1.forall(_.forall(_.size === 4)))
    val codes = Pq.encode(emb, cb1).collect()
    assert(codes.forall { r =>
      val cs = r.getSeq[Int](1)
      cs.size == 16 && cs.forall(c => c >= 0 && c < 16)
    })
    // every emitted (query, neighbor) pair's sim equals the EXACT cosine
    // (the refine stage re-ranks on full precision)
    val pq = Pq.topK(emb, nQueries = 4, kNeighbors = 5)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val brute = Cosine.bruteTopK(emb, nQueries = 4, k = 1000000)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    assert(pq.join(brute, Seq("query_id", "neighbor_id"))
      .filter(col("sim") =!= col("bsim")).isEmpty)
  }

  // ----------------------------------------------------- streaming MV

  test("streaming MV: fold equals recompute per batch; exactly-once under replay") {
    import spark.implicits._
    import graft.acid.{MaterializedView, MvSpec}
    import graft.streaming.{ChangeFeedStream, StreamMv}
    val base = tmp("smv_base"); val mv = tmp("smv_view") + "/v"
    val spec = MvSpec(Seq("grp"), Seq("amount"))
    TxLog.overwrite(Seq(
      (1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 2.0)
    ).toDF("id", "grp", "amount"), base)                                // v1
    var cursor = ChangeFeedStream.cursor(spark, base,
      MaterializedView.initialize(spark, base, mv, spec))
    def viewEqualsRecompute(): Boolean = {
      val v = TxLog.read(spark, mv)
      val r = MaterializedView.compute(TxLog.read(spark, base), spec)
      v.exceptAll(r).isEmpty && r.exceptAll(v).isEmpty
    }
    assert(viewEqualsRecompute())
    // batch 1: append
    TxLog.append(Seq((4L, "b", 7.0), (5L, "c", 1.0))
      .toDF("id", "grp", "amount"), base)                               // v2
    assert(StreamMv.pump(spark, base, mv, spec, cursor) === 1)
    assert(viewEqualsRecompute())
    // batch 2: merge (update + insert) — pre-pump cursor position saved
    // to replay this exact batch later
    val replayFrom = cursor.nextVersion
    TxLog.merge(Seq((1L, "a", 100.0), (6L, "c", 9.0))
      .toDF("id", "grp", "amount"), base, Seq("id"))                    // v3
    assert(StreamMv.pump(spark, base, mv, spec, cursor) === 1)
    assert(viewEqualsRecompute())
    val viewAfterV3 = TxLog.read(spark, mv).collect().toSet
    // CRASH SIMULATION (merge landed, cursor persist lost): a restarted
    // consumer re-polls the same batch — the fold must no-op, not
    // double-apply
    val replayCursor = ChangeFeedStream.cursor(spark, base, replayFrom)
    StreamMv.pump(spark, base, mv, spec, replayCursor)
    assert(TxLog.read(spark, mv).collect().toSet === viewAfterV3)
    assert(viewEqualsRecompute())
    // batch 3: delete empties group b — the fold must drop it
    TxLog.delete(spark, base, col("grp") === "b")                       // v4
    assert(StreamMv.pump(spark, base, mv, spec, cursor) === 1)
    assert(viewEqualsRecompute())
    assert(TxLog.read(spark, mv).filter(col("grp") === "b").isEmpty)
    // the view's watermark tracks the base head
    assert(MaterializedView.appliedThrough(spark, mv) ===
      TxLog.currentVersion(spark, base))
  }

  test("mergeConditional: NULL clause condition means not-satisfied") {
    import spark.implicits._
    val t = tmp("mc-null")
    TxLog.overwrite(Seq((1L, "a", 1.0)).toDF("id", "grp", "v"), t)
    // s.extra is NULL for the source row: the conditioned clause must
    // NOT fire (3-valued logic), the fallback unconditioned one must
    val src = Seq((1L, "a", 9.0, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "grp", "v", "extra")
    TxLog.mergeConditional(src, t, Seq("id"), Seq(
      MatchedUpdate(Some("s.extra > 0"), Map("v" -> "-1.0")),
      MatchedUpdate(None, Map("v" -> "s.v"))))
    assert(rows(TxLog.read(spark, t)) === Set((1L, "a", 9.0)))
  }
}
