package graft

import org.apache.spark.sql.functions._

import graft.acid.{GraftCatalog, TxLog}
import graft.analytics.GraftSql

/** Round-16 laws: predicate-filtered ANN search (the predicate reaches
  * the code scan BEFORE ADC ranking; both probe knobs widen by
  * selectivity), temporal SQL symmetry (timestamp-bounded CDF +
  * RESTORE), atomic CREATE OR REPLACE TABLE, partition-scoped OPTIMIZE,
  * persisted SQL views expanded through substituteReads, loud subquery
  * rejection in UPDATE/DELETE, and the rebalance commit made atomic. */
class Round16Spec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // --------------------------------------------- filtered ANN search

  test("probeFiltered: the predicate lands in the code scan (pushed " +
       "filter + cell pruning), every neighbor satisfies it, and the " +
       "selectivity-widened probe matches brute force over the subset") {
    import graft.similarity.{Cosine, IvfPq}
    val emb = Tables.embeddings(spark, sf)
    val idx = IvfPq.indexFor(emb, s"r16f:$sf", extraCols = Seq("label"))
    val pred = col("label") < 3
    val got = IvfPq.probeFiltered(emb, idx, nQueries = 8, kNeighbors = 10,
      filter = pred)
    // every returned neighbor satisfies the predicate — zero violations
    val labels = emb.select(col("vec_id").as("neighbor_id"), col("label"))
    assert(got.join(labels, Seq("neighbor_id"))
      .filter(col("label") >= 3).isEmpty, "a neighbor escaped the filter")
    // the widened probe is near-exhaustive at this scale: identical to
    // the exact brute force over the FILTERED subset
    val brute = Cosine.bruteTopKFiltered(emb, pred, nQueries = 8, k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val gotPairs = got.select(col("query_id"), col("neighbor_id"))
    assert(brute.exceptAll(gotPairs).isEmpty && gotPairs.exceptAll(brute).isEmpty,
      "filtered probe diverged from brute-force-over-subset")
    // plan pin: the attribute filter is PUSHED into the parquet scan of
    // the code table (pre-filter, not a post-ADC filter)
    val planText = got.queryExecution.executedPlan.toString
    assert(planText.contains("PushedFilters") && planText.contains("label"),
      s"label filter not pushed into the code scan:\n$planText")
    // cell pruning pin: a NON-selective filter keeps nprobe at 10, so a
    // single-query probe's code scan carries a `cell IN (...)` partition
    // filter of at most 10 values (inputFiles lists the relation's FULL
    // index — the pruning lives in the scan's PartitionFilters)
    val all = IvfPq.probeFiltered(emb, idx, nQueries = 1, kNeighbors = 5,
      filter = col("label") >= 0)
    val allPlan = all.queryExecution.executedPlan.toString
    val inList = "cell#\\d+L? IN \\(([^)]*)\\)".r.findFirstMatchIn(allPlan)
      .orElse("cell#\\d+L? INSET ([^\\]\\n]*)".r.findFirstMatchIn(allPlan))
    assert(inList.isDefined, s"no cell IN partition filter in:\n$allPlan")
    val nProbed = inList.get.group(1).split(",").length
    val cellDirs = new java.io.File(idx.codesPath).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(nProbed <= 10 && nProbed < cellDirs,
      s"expected <=10 of $cellDirs cells probed, got $nProbed")
    // a filter matching nothing rejects loudly (a silent empty top-k
    // would read as "no similar documents" — a lie)
    val e = intercept[IllegalArgumentException] {
      IvfPq.probeFiltered(emb, idx, 4, 5, filter = col("label") > 99)
    }
    assert(e.getMessage.contains("matches no indexed row"), e.getMessage)
    // a filter on a column the index never stored names the contract
    val e4 = intercept[IllegalArgumentException] {
      IvfPq.probeFiltered(emb, idx, 4, 5, filter = col("quality") > 0.5)
    }
    assert(e4.getMessage.contains("does not carry"), e4.getMessage)
  }

  // ------------------------------------- temporal SQL symmetry (CDF/RESTORE)

  test("table_changes timestamp bounds: start snaps FORWARD, end snaps " +
       "BACKWARD; unparseable strings and out-of-range starts reject") {
    val spark2 = spark
    import spark2.implicits._
    val wh = tmp("r16tswh"); val table = tmp("r16tstbl")
    TxLog.overwrite(Seq((1L, 10.0)).toDF("k", "v"), table)            // v1
    GraftCatalog.register(wh, "ts_t", table)
    TxLog.append(Seq((2L, 20.0)).toDF("k", "v"), table)               // v2
    val lastMtime = new java.io.File(table,
      f"_txlog/${2L}%020d.json").lastModified()
    // a start bound PAST the last commit has no changes to read —
    // reject, like Delta, never an empty feed that reads as "no changes"
    val farFuture = new java.sql.Timestamp(lastMtime + 3600 * 1000L)
      .toInstant.toString
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh,
        s"SELECT * FROM table_changes('ts_t', '$farFuture')").collect()
    }
    assert(e1.getMessage.contains("at or after"), e1.getMessage)
    // an unparseable timestamp string rejects with the named contract
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh,
        "SELECT * FROM table_changes('ts_t', 'not-a-time')").collect()
    }
    assert(e2.getMessage.contains("timestamp"), e2.getMessage)
    // RESTORE TO TIMESTAMP resolves by the TIMESTAMP AS OF rule
    val v1ts = new java.sql.Timestamp(new java.io.File(table,
      f"_txlog/${1L}%020d.json").lastModified()).toInstant.toString
    // make v2 strictly later than v1's tick so the bound is unambiguous
    if (new java.io.File(table, f"_txlog/${2L}%020d.json").lastModified() ==
        new java.io.File(table, f"_txlog/${1L}%020d.json").lastModified()) {
      // same-tick commits: the restore target is still a valid version,
      // just possibly v2 — skip the equality pin in that (rare) case
    } else {
      val r = GraftSql.execute(spark, wh,
        s"RESTORE TABLE ts_t TO TIMESTAMP AS OF '$v1ts'").collect()(0)
      assert(r.getLong(1) == 1L, s"expected restore to v1, got $r")
      assert(TxLog.read(spark, table).count() == 1L)
    }
  }

  // ------------------------------------------- CREATE OR REPLACE TABLE

  test("CREATE OR REPLACE TABLE: one commit on the existing location — " +
       "history time-travels through the replace, catalog entry stays, " +
       "plain REPLACE of a missing table rejects") {
    val spark2 = spark
    import spark2.implicits._
    val wh = tmp("r16repwh")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
      .createOrReplaceTempView("r16_rep_src")
    GraftSql.execute(spark, wh,
      "CREATE TABLE rep16 AS SELECT * FROM r16_rep_src")              // v1
    val loc = GraftCatalog.find(wh, "rep16").get.location
    val vBefore = TxLog.currentVersion(spark, loc)
    GraftSql.execute(spark, wh,
      "CREATE OR REPLACE TABLE rep16 AS SELECT k, v * 2 AS v2 " +
        "FROM r16_rep_src WHERE k = 1")                               // v2
    // ONE commit, same location, entry unchanged
    assert(TxLog.currentVersion(spark, loc) == vBefore + 1)
    assert(GraftCatalog.find(wh, "rep16").get.location == loc)
    // new schema live, old content still time-travelable
    assert(TxLog.read(spark, loc).columns.toSeq == Seq("k", "v2"))
    assert(TxLog.read(spark, loc, versionAsOf = Some(1)).count() == 2L)
    // declared-schema REPLACE form re-layouts (empty, partitioned)
    GraftSql.execute(spark, wh,
      "CREATE OR REPLACE TABLE rep16 (k BIGINT, part STRING) " +
        "PARTITIONED BY (part)")                                      // v3
    assert(TxLog.read(spark, loc).count() == 0L &&
      TxLog.partitionColsOf(spark, loc) == Seq("part"))
    // plain REPLACE (no OR CREATE) of a missing table rejects loudly
    val e = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh,
        "REPLACE TABLE rep16_missing AS SELECT * FROM r16_rep_src")
    }
    assert(e.getMessage.contains("no such table"), e.getMessage)
  }

  // --------------------------------------------- partition-scoped OPTIMIZE

  test("OPTIMIZE t WHERE part = v rewrites ONLY the matched partition; " +
       "every other partition's file list is byte-identical; data-column " +
       "predicates reject") {
    val spark2 = spark
    import spark2.implicits._
    val wh = tmp("r16optwh"); val table = tmp("r16opttbl")
    val rows = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      i * 1.0)).toDF("k", "part", "v")
    TxLog.overwrite(rows, table, Seq("part"))
    GraftCatalog.register(wh, "opt16", table)
    TxLog.append(rows.filter(col("k") <= 10), table)
    TxLog.append(rows.filter(col("k") <= 10), table)
    val aBefore = TxLog.livePaths(spark, table).filter(_.contains("part=a"))
    val bBefore = TxLog.livePaths(spark, table).filter(_.contains("part=b"))
    val contentBefore = TxLog.read(spark, table)
      .agg(sum("v"), count(lit(1))).collect()(0)
    val st = GraftSql.execute(spark, wh,
      "OPTIMIZE opt16 WHERE part = 'a'").collect()(0)
    assert(st.getInt(1) == aBefore.size && st.getInt(2) < aBefore.size,
      s"expected all ${aBefore.size} a-files rewritten into fewer, got $st")
    val aAfter = TxLog.livePaths(spark, table).filter(_.contains("part=a"))
    val bAfter = TxLog.livePaths(spark, table).filter(_.contains("part=b"))
    assert(aAfter.intersect(aBefore).isEmpty, "an old a-file survived")
    assert(bAfter == bBefore, "partition b's file list changed")
    assert(TxLog.read(spark, table).agg(sum("v"), count(lit(1)))
      .collect()(0) == contentBefore, "content changed")
    // a data-column predicate cannot bound a partition rewrite
    val e = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh, "OPTIMIZE opt16 WHERE v = 1.0")
    }
    assert(e.getMessage.contains("not a partition column"), e.getMessage)
    // a non-equality predicate rejects at the door
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh, "OPTIMIZE opt16 WHERE part > 'a'")
    }
    assert(e2.getMessage.contains("conjunction"), e2.getMessage)
  }

  // ----------------------------------------------------------- SQL views

  test("views: persisted in the catalog, expanded at read time, resolve " +
       "in a FRESH session with no attachAll; nesting works, cycles and " +
       "name collisions reject") {
    val spark2 = spark
    import spark2.implicits._
    val wh = tmp("r16vwwh"); val table = tmp("r16vwtbl")
    TxLog.overwrite(Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "x", 30.0))
      .toDF("k", "g", "v"), table)
    GraftCatalog.register(wh, "base16", table)
    GraftSql.execute(spark, wh,
      "CREATE VIEW g_tot AS SELECT g, sum(v) AS tot FROM base16 GROUP BY g")
    GraftSql.execute(spark, wh,
      "CREATE VIEW g_big AS SELECT * FROM g_tot WHERE tot > 15")
    // a FRESH session (empty temp-view namespace — no attachAll ever
    // ran in it) resolves the nested view through the catalog alone
    val fresh = spark.newSession()
    val rows = GraftSql.execute(fresh, wh,
      "SELECT * FROM g_big ORDER BY g").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq
      == Seq(("x", 40.0), ("y", 20.0)))
    // live: views read the CURRENT snapshot of their base tables
    GraftSql.execute(spark, wh, "UPDATE base16 SET v = v + 100 WHERE k = 2")
    assert(GraftSql.execute(spark, wh,
      "SELECT tot FROM g_tot WHERE g = 'y'").collect()(0).getDouble(0)
      == 120.0)
    // a view name may not collide with a table name (and vice versa)
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh, "CREATE VIEW base16 AS SELECT 1 AS one")
    }
    assert(e1.getMessage.contains("registered TABLE"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      GraftCatalog.register(wh, "g_tot", table)
    }
    assert(e2.getMessage.contains("registered VIEW"), e2.getMessage)
    // self-reference rejects at read time with the chain
    GraftSql.execute(spark, wh, "DROP VIEW g_big")
    GraftSql.execute(spark, wh,
      "CREATE VIEW g_big AS SELECT * FROM g_big")
    val e3 = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh, "SELECT * FROM g_big").collect()
    }
    assert(e3.getMessage.contains("cycle"), e3.getMessage)
    // CREATE VIEW with a syntax-broken body fails at CREATE, not read
    intercept[Exception] {
      GraftSql.execute(spark, wh, "CREATE VIEW broken AS SELEKT 1")
    }
    assert(GraftCatalog.findView(wh, "broken").isEmpty)
    // SHOW VIEWS lists the catalog's views (name + stored text)
    val shown = GraftSql.execute(spark, wh, "SHOW VIEWS").collect()
    assert(shown.map(_.getString(0)).sorted.toSeq == Seq("g_big", "g_tot"))
  }

  // ---------------------------------- subquery conditions in UPDATE/DELETE

  test("UPDATE/DELETE with subquery conditions reject loudly with the " +
       "MERGE rewrite named (never an unresolved-plan error deep in the " +
       "kernel)") {
    val spark2 = spark
    import spark2.implicits._
    val wh = tmp("r16sqwh"); val table = tmp("r16sqtbl")
    TxLog.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), table)
    GraftCatalog.register(wh, "sq16", table)
    Seq(1L).toDF("k").createOrReplaceTempView("r16_sq_ids")
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh,
        "DELETE FROM sq16 WHERE k IN (SELECT k FROM r16_sq_ids)")
    }
    assert(e1.getMessage.contains("GRAFT_SUBQUERY_CONDITION_UNSUPPORTED") &&
      e1.getMessage.contains("MERGE"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh,
        "UPDATE sq16 SET v = 0 WHERE EXISTS (SELECT 1 FROM r16_sq_ids)")
    }
    assert(e2.getMessage.contains("GRAFT_SUBQUERY_CONDITION_UNSUPPORTED"),
      e2.getMessage)
    // assignment VALUES are guarded too, not just WHERE
    val e3 = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, wh,
        "UPDATE sq16 SET v = (SELECT max(k) FROM r16_sq_ids)")
    }
    assert(e3.getMessage.contains("GRAFT_SUBQUERY_CONDITION_UNSUPPORTED"),
      e3.getMessage)
    // the named rewrite WORKS: MERGE USING the subquery (projected to
    // the table's full width — the kernel's source contract) deletes
    GraftSql.execute(spark, wh,
      "MERGE INTO sq16 t USING (SELECT k, CAST(0.0 AS DOUBLE) AS v " +
        "FROM r16_sq_ids) s ON t.k = s.k WHEN MATCHED THEN DELETE")
    assert(TxLog.read(spark, table).count() == 1L)
  }

  // ------------------------------------------- engine-verb fall-through

  test("ANALYZE TABLE / SHOW PARTITIONS on non-graft targets fall " +
       "through to the engine instead of failing in resolveName") {
    val spark2 = spark
    import spark2.implicits._
    val wh = tmp("r16ftwh")
    Seq((1, "a")).toDF("id", "s").createOrReplaceTempView("r16_plain_view")
    // the engine rejects ANALYZE on a temp view — but with ITS error,
    // not graft's "maintenance target" resolveName failure
    val e = intercept[Exception] {
      GraftSql.execute(spark, wh, "ANALYZE TABLE r16_plain_view COMPUTE STATISTICS")
    }
    assert(!e.getMessage.contains("maintenance target"), e.getMessage)
    val e2 = intercept[Exception] {
      GraftSql.execute(spark, wh, "SHOW PARTITIONS r16_plain_view")
    }
    assert(!e2.getMessage.contains("maintenance target"), e2.getMessage)
  }

  // ----------------------------------------------- INSERT BY NAME case

  test("INSERT BY NAME binds a source column differing only in case " +
       "(aliased to the table's spelling through the cast projection)") {
    val spark2 = spark
    import spark2.implicits._
    val wh = tmp("r16bnwh"); val table = tmp("r16bntbl")
    TxLog.overwrite(Seq((1L, 10.0)).toDF("k", "total_amount"), table)
    GraftCatalog.register(wh, "bn16", table)
    Seq((2L, 20.0)).toDF("K", "Total_Amount")
      .createOrReplaceTempView("r16_bn_src")
    GraftSql.execute(spark, wh,
      "INSERT INTO bn16 BY NAME SELECT * FROM r16_bn_src")
    assert(TxLog.read(spark, table).agg(sum("total_amount"))
      .collect()(0).getDouble(0) == 30.0)
  }

  // -------------------------------------------- atomic rebalance commit

  test("rebalanceCells lands the split as ONE commit (data + tag move " +
       "atomically); all-1-row hot cells return Balanced instead of " +
       "throwing") {
    import graft.similarity.AnnIndexStore
    import AnnIndexStore.RebalanceOutcome
    val spark2 = spark
    import spark2.implicits._
    // 1-row-hot-cell guard: the census [1, 0, …] shape (ADVICE r15)
    // arises from SHRINKS — build over two corpus files, erase the big
    // one, and the surviving census is a lone 1-row cell over a mean of
    // 1/nActual < 1/RebalanceSkew: flagged hot, but unsplittable. The
    // pre-fix code indexed subCents(1) and threw.
    val wh0 = tmp("r16rb0wh"); val corpus0 = tmp("r16rb0corp")
    val emb00 = Tables.embeddings(spark, sf)
    emb00.filter(col("vec_id") === 0).coalesce(1)
      .write.mode("append").parquet(corpus0)
    emb00.filter(col("vec_id") > 0 && col("vec_id") < 40).coalesce(1)
      .write.mode("append").parquet(corpus0)
    AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus0), wh0, "rb0",
      nCells = 16, m = 16, k = 16)
    val victim = spark.read.parquet(corpus0).inputFiles
      .maxBy(f => new java.io.File(new java.net.URI(f)).length())
    new java.io.File(new java.net.URI(victim)).delete()
    val (_, oShrunk) = AnnIndexStore.ivfPqIndex(
      spark.read.parquet(corpus0), wh0, "rb0", nCells = 16, m = 16, k = 16)
    assert(oShrunk == AnnIndexStore.IndexOutcome.Shrunk(1), oShrunk.toString)
    val (census0, flagged0) = AnnIndexStore.cellHealth(spark, wh0, "rb0").get
    assert(flagged0 && census0.max == 1L,
      s"fixture must yield a flagged 1-row census, got $census0")
    assert(AnnIndexStore.rebalanceCells(spark, wh0, "rb0")
      == RebalanceOutcome.Balanced)
    // atomicity: a real split is exactly ONE new version, op
    // overwritePartitions, carrying the new tag — no window where the
    // data moved but the tag (centroids/census) lags
    // the Round15Spec fixture shape exactly (it provably clears the
    // flag): base corpus + 400 separable skew rows in one cell —
    // built WITH an attribute column (round 16: the persisted index
    // carries scalar fields for filtered search; the rebalance must
    // carry them through the split re-encode)
    val wh = tmp("r16rbwh"); val corpus = tmp("r16rbcorp")
    val emb0 = Tables.embeddings(spark, sf)
    emb0.filter(col("vec_id") < 400).repartition(2)
      .write.mode("overwrite").parquet(corpus)
    AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus), wh, "rb16",
      nCells = 16, m = 16, k = 64, attrCols = Seq("label"))
    val v0 = emb0.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val nrm = math.sqrt(v0.map(x => x.toDouble * x).sum).toFloat
    val skewRows = (0 until 400).map { i =>
      val g = i % 4
      val v = v0.toArray.clone()
      v(g * 4) += 0.5f * nrm
      v(32 + g) += 0.02f * nrm * ((i / 4 % 7) - 3) / 3f
      (100000L + i, v.toSeq, i % 10)
    }
    skewRows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(corpus)
    val (_, oExt) = AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus),
      wh, "rb16", nCells = 16, m = 16, k = 64, attrCols = Seq("label"))
    assert(oExt == AnnIndexStore.IndexOutcome.Extended(1), oExt.toString)
    val loc = GraftCatalog.find(wh, "rb16").get.location
    val before = TxLog.currentVersion(spark, loc)
    val out = AnnIndexStore.rebalanceCells(spark, wh, "rb16")
    assert(out.isInstanceOf[RebalanceOutcome.Split], out.toString)
    assert(TxLog.currentVersion(spark, loc) == before + 1,
      "split must be exactly one commit")
    val lastOp = TxLog.historyFull(spark, loc).maxBy(_._1)._3
    assert(lastOp == "overwritePartitions", lastOp)
    // the tag landed IN that commit: census/centroids agree with data
    val (census, flag) = AnnIndexStore.cellHealth(spark, wh, "rb16").get
    assert(!flag && census.sum == TxLog.read(spark, loc).count())
    // the attribute column survived the split re-encode on EVERY row —
    // a dropped label would break all future filtered probes
    assert(TxLog.read(spark, loc).filter(col("label").isNull).isEmpty,
      "label lost through rebalance")
    // the persisted, rebalanced index serves a filtered probe: a pure
    // LOAD (no retrain), predicate pushed against the stored codes,
    // every neighbor inside the predicate
    val (idx3, oLoad) = AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus),
      wh, "rb16", nCells = 16, m = 16, k = 64, attrCols = Seq("label"))
    assert(oLoad == AnnIndexStore.IndexOutcome.Loaded, oLoad.toString)
    val emb2 = spark.read.parquet(corpus)
    val filtered = graft.similarity.IvfPq.probeFiltered(emb2, idx3,
      nQueries = 4, kNeighbors = 5, filter = col("label") < 5)
    assert(filtered.join(
        emb2.filter(col("label") >= 5)
          .select(col("vec_id").as("neighbor_id")),
        Seq("neighbor_id"), "left_semi").isEmpty,
      "a neighbor escaped the filter on the persisted index")
    // an attrs-mismatched request is a DIFFERENT index: retrains
    val (_, oPlain) = AnnIndexStore.ivfPqIndex(spark.read.parquet(corpus),
      wh, "rb16", nCells = 16, m = 16, k = 64)
    assert(oPlain.isInstanceOf[AnnIndexStore.IndexOutcome.Trained],
      oPlain.toString)
  }

  // ---------------------------------------------------- VACUUM DRY RUN

  test("VACUUM DRY RUN lists exactly what the real vacuum then reclaims " +
       "— and deletes nothing itself") {
    val spark2 = spark
    import spark2.implicits._
    val wh = tmp("r16vdwh"); val table = tmp("r16vdtbl")
    TxLog.overwrite(Seq((1L, 1.0)).toDF("k", "v"), table)
    GraftCatalog.register(wh, "vd16", table)
    TxLog.overwrite(Seq((2L, 2.0)).toDF("k", "v"), table) // orphans v1's file
    val dry = GraftSql.execute(spark, wh,
      "VACUUM vd16 RETAIN 1 VERSIONS DRY RUN")
      .collect().map(_.getString(2)).toSeq
    assert(dry.nonEmpty, "overwrite must orphan at least one file")
    assert(dry.forall(p => new java.io.File(table, p).exists()),
      "dry run deleted something")
    GraftSql.execute(spark, wh, "VACUUM vd16 RETAIN 1 VERSIONS")
    assert(dry.forall(p => !new java.io.File(table, p).exists()),
      "real vacuum did not reclaim the dry-run list")
    assert(TxLog.read(spark, table).count() == 1L)
  }
}
