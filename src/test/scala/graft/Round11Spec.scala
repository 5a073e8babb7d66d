package graft

import org.apache.spark.sql.functions._

import graft.acid.TxLog

/** Round-11 laws: the native PQ encoder (codegen argmin == driver
  * arithmetic, dim guard), the `graft-table` streaming source
  * (exactly-once across a crash-window restart through the STANDARD
  * checkpoint mechanism, streamed feed == batch feed), paragraph-level
  * dedup (ownership determinism, reassembly fidelity, token
  * accounting), domain curation (host/domain extraction on URL shapes,
  * blocklist, cap + exact kept membership), and SemDeDup (keep-one ==
  * the global smaller-id dominance rule, identical-copy collapse). */
class Round11Spec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ------------------------------------------------------ native PQ encode

  test("pq_encode: codegen argmin equals driver arithmetic, ties stay low") {
    import graft.functions.PqEncodeFunction
    val m = 2; val subd = 2
    // codebook with an exact tie in subspace 0 (codes 0 and 1 are the
    // same centroid): the argmin must keep the LOWER code
    val cb: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(0.0, 0.0), Seq(5.0, 5.0)),
      Seq(Seq(1.0, 1.0), Seq(2.0, 2.0), Seq(9.0, 9.0)))
    val rows = Seq(
      (1L, Seq(0.1, -0.1, 2.1, 1.9)), // sub0 -> 0 (tie with 1), sub1 -> 1
      (2L, Seq(4.0, 4.9, 8.0, 8.0)),  // sub0 -> 2, sub1 -> 2
      (3L, Seq(0.0, 0.0, 1.4, 1.4)))  // sub1: d(c0)=0.32 < d(c1)=0.72
    val df = spark.createDataFrame(rows).toDF("vec_id", "v")
    val got = df.select(col("vec_id"),
        PqEncodeFunction.pq_encode(spark, col("v"), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(0, 1))
    assert(got(2L) == Seq(2, 2))
    assert(got(3L) == Seq(0, 0))
    // driver-side brute argmin over the corpus, vs the expression
    val emb = Tables.embeddings(spark, sf)
    val cb2 = graft.similarity.Pq.train(emb, 16, 16, iters = 1)
    val enc = graft.similarity.Pq.encode(emb, cb2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val vecs = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val sub2 = cb2.head.head.size
    for ((id, v) <- vecs; j <- cb2.indices) {
      val best = cb2(j).zipWithIndex.minBy { case (c, _) =>
        ((0 until sub2).map(i => { val d = v(j * sub2 + i) - c(i); d * d }).sum,
         0) // stable minBy keeps the first (lowest code) on ties
      }._2
      assert(enc(id)(j) == best, s"codegen argmin mismatch at ($id, $j)")
    }
  }

  test("pq_encode: dimension mismatch fails loudly") {
    import graft.functions.PqEncodeFunction
    val cb: Seq[Seq[Seq[Double]]] = Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    val df = spark.createDataFrame(Seq((1L, Seq(1.0, 2.0, 3.0))))
      .toDF("vec_id", "v")
    val ex = intercept[Exception] {
      df.select(PqEncodeFunction.pq_encode(spark, col("v"), cb)).collect()
    }
    assert(ex.getMessage != null)
  }

  // ------------------------------------------------- graft-table source

  test("graft-table: streamed feed == batch feed, exactly-once across restart") {
    val table = tmp("r11src"); val ckpt = tmp("r11ck")
    val spark2 = spark
    import spark2.implicits._
    val base = (1L to 40L).map(i => (i, i * 1.0)).toDF("id", "v")
    TxLog.overwrite(base, table)                                   // v1
    TxLog.append((41L to 60L).map(i => (i, i * 1.0)).toDF("id", "v"),
      table)                                                       // v2
    val name = s"r11_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    def run(): Long = {
      val q = spark.readStream.format("graft-table")
        .option("path", table).load()
        .groupBy("_commit_version", "_change_type")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .writeStream.outputMode("complete").format("memory")
        .queryName(name).option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable(); q.recentProgress.map(_.numInputRows).sum }
      finally q.stop()
    }
    val rows1 = run()
    assert(rows1 == 60L) // v1 adds + v2 adds, delivered once
    // crash window: a merge (update + insert) lands while the query is down
    TxLog.merge(Seq((5L, 500.0), (61L, 61.0)).toDF("id", "v"),
      table, Seq("id"))                                            // v3
    val rows2 = run()
    // v3 feed: update_preimage + update_postimage + insert = 3 rows —
    // nothing from v1/v2 re-delivered through the standard checkpoint
    assert(rows2 == 3L, s"restart must deliver only v3's changes, got $rows2")
    val streamed = spark.table(name)
      .select("_commit_version", "_change_type", "n", "sv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = TxLog.readChangeFeed(spark, table, 1L)
      .groupBy("_commit_version", "_change_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("graft-table: startVersion skips history; no-commit poll yields no batch") {
    val table = tmp("r11sv")
    val spark2 = spark
    import spark2.implicits._
    TxLog.overwrite(Seq((1L, 1.0)).toDF("id", "v"), table)         // v1
    TxLog.append(Seq((2L, 2.0)).toDF("id", "v"), table)            // v2
    val name = s"r11b_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("graft-table")
      .option("path", table).option("startVersion", "2").load()
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      q.processAllAvailable()
      val got = spark.table(name).select("id").as[Long].collect().toSet
      assert(got == Set(2L)) // v1's row skipped
      val batches = q.recentProgress.length
      q.processAllAvailable() // nothing new committed
      assert(q.recentProgress.count(_.numInputRows > 0) <= 1)
      assert(batches >= 1)
    } finally q.stop()
  }

  test("graft-table sink: batch-id dedup, create-if-absent, append-only") {
    import graft.streaming.TxLogSink
    val table = tmp("r11sink")
    val spark2 = spark
    import spark2.implicits._
    val sink = new TxLogSink(spark.sqlContext, table, Seq.empty, "default")
    val b0 = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    sink.addBatch(0, b0) // bootstraps: empty v1 overwrite + tagged append
    assert(TxLog.currentVersion(spark, table) == 2L)
    assert(TxLogSink.appliedThrough(spark, table, "default") == 0L)
    // a fresh instance models the crash-replay path (the cached
    // watermark is per-instance; a re-offer must consult the log)
    new TxLogSink(spark.sqlContext, table, Seq.empty, "default")
      .addBatch(0, b0) // re-offered id: must not double-apply
    assert(TxLog.currentVersion(spark, table) == 2L)
    sink.addBatch(1, Seq((3L, 3.0)).toDF("id", "v"))
    assert(TxLog.currentVersion(spark, table) == 3L)
    assert(TxLogSink.appliedThrough(spark, table, "default") == 1L)
    val got = TxLog.read(spark, table).as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("graft-table sink: end-to-end stream equals staged input across restart") {
    val table = tmp("r11sinke2e"); val ckpt = tmp("r11sinkck")
    val src = tmp("r11sinkin")
    val spark2 = spark
    import spark2.implicits._
    val in = (1L to 100L).map(i => (i, i % 7, i * 0.5)).toDF("id", "k", "v")
    in.repartition(3).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream.format("graft-table").option("path", table)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val v1 = TxLog.currentVersion(spark, table)
    run() // restart with nothing new: no re-delivery
    assert(TxLog.currentVersion(spark, table) == v1)
    val got = TxLog.read(spark, table).as[(Long, Long, Double)].collect().toSet
    assert(got == in.as[(Long, Long, Double)].collect().toSet)
    assert(graft.streaming.TxLogSink.appliedThrough(spark, table,
      graft.streaming.TxLogSink.scopeFor(Map("checkpointLocation" -> ckpt))) == 2L)
  }

  // ------------------------------------------------------ paragraph dedup

  test("paragraph dedup: ownership, reassembly, and token accounting") {
    import graft.text.ParagraphDedup
    val spark2 = spark
    import spark2.implicits._
    // chunk=2 for readability: doc 1 = [a b][c d], doc 2 = [c d][x y],
    // doc 3 = [a b] — docs 2/3 lose their repeated windows to doc 1
    val docs = Seq(
      (1L, "A b c D"), (2L, "c d x Y"), (3L, "a B")).toDF("doc_id", "text")
    val out = ParagraphDedup.dedup(docs, chunkTokens = 2)
      .orderBy("doc_id").collect()
    val byDoc = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5))).toMap
    assert(byDoc(1L) == ((2L, 2L, 4L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("a b c d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
    assert(byDoc(2L)._1 == 2L && byDoc(2L)._2 == 1L && byDoc(2L)._3 == 2L)
    assert(byDoc(3L) == ((1L, 0L, 0L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString)))
    // duplicate-free corpus: nothing removed, reassembly == normalized text
    val clean = Seq((10L, "p q r s t")).toDF("doc_id", "text")
    val c = ParagraphDedup.dedup(clean, chunkTokens = 2).collect()(0)
    assert(c.getLong(1) == 3L && c.getLong(2) == 3L && c.getLong(3) == 5L)
    assert(c.getDouble(4) == 0.0)
  }

  test("paragraph dedup: corpus-wide idempotence (second pass removes nothing)") {
    import graft.text.ParagraphDedup
    val docs = Tables.documents(spark, sf).limit(50)
    val first = ParagraphDedup.dedup(docs)
    // reassembled survivors, re-deduped: every paragraph already unique
    val spark2 = spark
    import spark2.implicits._
    val paras1 = ParagraphDedup.paragraphs(docs)
      .withColumn("h", md5(col("para")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy("doc_id", "idx")
    val kept = paras1.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val nKeptTotal = first.agg(sum("n_kept")).as[Long].collect()(0)
    assert(kept.count() == nKeptTotal)
    assert(kept.select("h").distinct().count() == nKeptTotal)
  }

  // ------------------------------------------------------- domain curation

  test("curation: host and registrable-domain extraction across URL shapes") {
    import graft.etl.Curation
    val spark2 = spark
    import spark2.implicits._
    val urls = Seq(
      "https://www.example.com/path?q=1",
      "http://cdn.assets.deep.sub.site.org/a/b#frag",
      "https://two-label.io",
      "ftp://files.archive.net/x",
      "https://example.com?direct=query").toDF("url")
    val got = urls.select(Curation.host(col("url")).as("h"),
        Curation.registrableDomain(col("url")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0) == (("www.example.com", "example.com")))
    assert(got(1) == (("cdn.assets.deep.sub.site.org", "site.org")))
    assert(got(2) == (("two-label.io", "two-label.io")))
    assert(got(3) == (("files.archive.net", "archive.net")))
    assert(got(4) == (("example.com", "example.com")))
  }

  test("curation: blocklist empties domains, caps bind, membership is smallest-lcg") {
    import graft.etl.Curation
    val spark2 = spark
    import spark2.implicits._
    val docs = (0L until 30L).map(i =>
        (i, s"https://host${i % 3}.dom${i % 3}.com/p/$i"))
      .toDF("doc_id", "url").withColumn("text", lit("x"))
    val rep = Curation.domainReport(docs, "url",
      blocklist = Seq("dom1.com"), perDomainCap = 4).collect()
    val byDom = rep.map(r => r.getString(0) ->
      (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4))).toMap
    assert(byDom("dom1.com") == ((10L, true, 0L, 0L)))
    for (d <- Seq("dom0.com", "dom2.com")) {
      val (n, blocked, kept, xor) = byDom(d)
      assert(n == 10L && !blocked && kept == 4L)
      // expected: the 4 ids of smallest lcg order within the domain
      val ids = (0L until 30L).filter(i => s"dom${i % 3}.com" == d)
      val expect = ids.sortBy(i => ((i * 1103515245L + 12345L) % 2147483648L, i))
        .take(4)
      assert(xor == expect.reduce(_ ^ _))
    }
    // kept rows themselves never exceed the cap
    val kept = Curation.curateDomains(docs, "url", Seq("dom1.com"), 4)
    val over = kept.groupBy("domain").count().filter(col("count") > 4).count()
    assert(over == 0 && kept.filter(col("domain") === "dom1.com").count() == 0)
  }

  // ------------------------------------------------------------- semdedup

  test("semdedup: keep-one equals the global smaller-id dominance rule") {
    import graft.similarity.SemDedup
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") % 4 === 0)
      .withColumn("embedding", expr(
        "transform(embedding, x -> cast(x * (1.0 + (vec_id % 5 + 1) / 100.0) as float))"))
      .select((-(col("vec_id") + 1)).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(planted)
    val flags = SemDedup.flags(corpus, tau = 0.9)
      .select("vec_id", "dropped").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // driver brute force of the global rule
    val vecs = corpus.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    for ((id, v) <- vecs) {
      val expect = vecs.exists { case (id2, v2) =>
        id2 < id && cos(v, v2) >= 0.9 }
      assert(flags(id) == expect, s"dominance mismatch for $id")
    }
    assert(flags.size == vecs.length)
  }

  test("semdedup: byte-identical copies collapse to the min-id member") {
    import graft.similarity.SemDedup
    val spark2 = spark
    import spark2.implicits._
    // orthogonal base vectors (no cross dominance), exact copies of v1
    val rows = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), // copy of 10 — dropped
      (3L,  Seq(1.0f, 0.0f, 0.0f, 0.0f)), // copy, SMALLEST id — survives
      (20L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (30L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = SemDedup.flags(df, nCells = 2, tau = 0.9)
      .select("vec_id", "dropped").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(3L -> false, 10L -> true, 11L -> true,
      20L -> false, 30L -> false))
    val rep = SemDedup.report(df, nCells = 2, tau = 0.9).collect()(0)
    assert(rep.getLong(0) == 5L && rep.getLong(1) == 2L &&
      rep.getLong(2) == (10L ^ 11L) && rep.getLong(3) == 3L)
  }
}
