package graft

import org.apache.spark.sql.functions._

import graft.acid.TxLog

class BloomSkipSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bloom").toString

  // hash-id column: min/max of every file spans the whole hex domain
  private def data = spark.range(4096).select(
    col("id"), md5(col("id").cast("string")).as("uid"),
    (col("id") % 97).cast("double").as("v"))

  private def probe(t: String, cond: org.apache.spark.sql.Column): (Long, Int, Int) = {
    val (table, idx) = TxLog.readWithSkipInfo(spark, t)
    val n = table.filter(cond).count()
    val (sel, tot) = idx.lastListing.get
    (n, sel, tot)
  }

  test("bloom skips equality probes that min/max cannot; answers unchanged") {
    val t = tmp()
    TxLog.overwrite(data.repartition(16), t)
    val key = md5(lit("77"))
    val (n0, sel0, tot0) = probe(t, col("uid") === key)
    assert(n0 == 1L && sel0 == tot0,
      s"without blooms a hash-id equality must scan all files ($sel0/$tot0)")
    TxLog.setBloomFilter(spark, t, Seq("uid"))
    TxLog.overwrite(data.repartition(16), t)
    val (n1, sel1, tot1) = probe(t, col("uid") === key)
    assert(n1 == 1L, "bloom skipping must never drop a present key")
    assert(sel1 < tot1, s"bloom must skip files ($sel1/$tot1)")
    // absent key: bloom excludes (almost) everything, result stays empty
    val (nAbs, selAbs, totAbs) = probe(t, col("uid") === md5(lit("nope")))
    assert(nAbs == 0L && selAbs < totAbs)
    // IN-list probes go through the bloom too
    val (nIn, selIn, totIn) =
      probe(t, col("uid").isin(/* md5("7") */ "8f14e45fceea167a5a36dedd4bea2543",
                               /* md5("8") */ "c9f0f895fb98ab9159f51fd0297e236d"))
    assert(nIn == 2L && selIn < totIn)
  }

  test("append and merge after setBloomFilter index their new files") {
    import spark.implicits._
    val t = tmp()
    TxLog.overwrite(data.repartition(4), t)
    TxLog.setBloomFilter(spark, t, Seq("uid"))
    // append 4 more files; only they carry blooms — a probe for a key in
    // the appended range may still scan the 4 bloom-less originals but
    // must be able to skip appended files that exclude it
    TxLog.append(
      spark.range(4096, 8192).select(col("id"),
        md5(col("id").cast("string")).as("uid"),
        (col("id") % 97).cast("double").as("v")).repartition(4), t)
    val key = md5(lit("42")) // lives in an ORIGINAL (bloom-less) file
    val (n, sel, tot) = probe(t, col("uid") === key)
    assert(n == 1L)
    assert(sel < tot, "appended files excluding the key must be skipped")
    // every present key in a rewritten-by-merge file stays findable
    val upd = Seq((42L, "deadbeef", 1.0)).toDF("id", "uid", "v")
    TxLog.merge(upd, t, Seq("id"))
    val (n2, _, _) = probe(t, col("uid") === lit("deadbeef"))
    assert(n2 == 1L, "merge-rewritten files must carry fresh blooms")
  }

  test("bloom config survives plain overwrite, drops with overwriteSchema") {
    val t = tmp()
    TxLog.overwrite(data.repartition(4), t)
    TxLog.setBloomFilter(spark, t, Seq("uid"))
    TxLog.overwrite(data.repartition(8), t)
    val (_, sel, tot) = probe(t, col("uid") === md5(lit("9")))
    assert(sel < tot, "bloom config must survive a plain overwrite")
    TxLog.overwrite(data.select("id", "uid"), t, overwriteSchema = true)
    val (_, sel2, tot2) = probe(t, col("uid") === md5(lit("9")))
    assert(sel2 == tot2, "overwriteSchema drops the bloom config")
  }
}
