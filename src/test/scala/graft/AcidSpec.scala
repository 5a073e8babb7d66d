package graft

import org.apache.spark.sql.functions._

import graft.acid.TxLog

class AcidSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_acid").toString

  import scala.jdk.CollectionConverters._
  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("overwrite + append round-trips rows and schema") {
    import spark.implicits._
    val t = tmp()
    val a = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "tag", "amt")
    val b = Seq((3L, "z", 3.5)).toDF("id", "tag", "amt")
    TxLog.overwrite(a, t)
    TxLog.append(b, t)
    val back = TxLog.read(spark, t)
    assert(back.schema.fieldNames.toSeq == Seq("id", "tag", "amt"))
    assert(rows(back) == rows(a.unionByName(b)))
    assert(TxLog.currentVersion(spark, t) == 2L)
  }

  test("append rejects a drifted schema; overwrite requires overwriteSchema") {
    import spark.implicits._
    val t = tmp()
    TxLog.overwrite(Seq((1L, 1.0)).toDF("id", "amt"), t)
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, "oops")).toDF("id", "amt"), t)
    }
    intercept[IllegalArgumentException] {
      TxLog.overwrite(Seq((2L, 1.0, true)).toDF("id", "amt", "flag"), t)
    }
    TxLog.overwrite(Seq((2L, 1.0, true)).toDF("id", "amt", "flag"), t,
      overwriteSchema = true)
    assert(TxLog.read(spark, t).schema.size == 3)
    // time travel: v1 keeps its own (old) schema
    assert(TxLog.read(spark, t, Some(1L)).schema.size == 2)
  }

  test("partitioned table: dynamic overwrite replaces emptied partitions; time travel") {
    import spark.implicits._
    val t = tmp()
    val v1 = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0))
      .toDF("fleet", "mth", "amt")
    TxLog.overwrite(v1, t, Seq("fleet", "mth"))
    val aSlice = v1.filter(col("fleet") === "a")
    TxLog.overwritePartitions(aSlice.filter(col("amt") < 15), t, Some(aSlice))
    // latest: (a,2) replaced-to-empty, (b,1) untouched, (a,1) reprocessed
    assert(rows(TxLog.read(spark, t).select("fleet", "mth", "amt")) ==
      Set(Seq("a", 1, 10.0), Seq("b", 1, 30.0)))
    // v1 still fully readable (time travel)
    assert(rows(TxLog.read(spark, t, Some(1L)).select("fleet", "mth", "amt")) ==
      rows(v1))
    // partition filter prunes via log metadata: only matching branches scan
    val pruned = TxLog.read(spark, t).filter(col("fleet") === "b")
    assert(rows(pruned.select("amt")) == Set(Seq(30.0)))
  }

  test("vacuum drops files unreachable from the retained version; snapshot survives") {
    import spark.implicits._
    val t = tmp()
    TxLog.overwrite(Seq((1L, 1.0)).toDF("id", "amt"), t)
    TxLog.overwrite(Seq((2L, 2.0)).toDF("id", "amt"), t)
    TxLog.vacuum(spark, t, retainVersion = 2L)
    assert(rows(TxLog.read(spark, t)) == Set(Seq(2L, 2.0)))
    // v1's files are gone — reading it must now fail at scan time
    intercept[Exception] {
      TxLog.read(spark, t, Some(1L)).collect()
    }
  }

  test("compactLog folds history into one commit without changing the snapshot") {
    import spark.implicits._
    val t = tmp()
    TxLog.overwrite(Seq((1L, "a")).toDF("id", "tag"), t)
    TxLog.append(Seq((2L, "b")).toDF("id", "tag"), t)
    TxLog.append(Seq((3L, "c")).toDF("id", "tag"), t)
    val before = rows(TxLog.read(spark, t))
    TxLog.compactLog(spark, t)
    assert(rows(TxLog.read(spark, t)) == before)
    val h = TxLog.history(spark, t)
    assert(h.last._1 == 4L && h.last._4, "compaction commit carries meta")
  }

  test("optimize compacts to one file per partition, preserving data and history") {
    import spark.implicits._
    val t = tmp()
    val parts = Seq("fleet")
    TxLog.overwrite(Seq(("a", 1.0)).toDF("fleet", "amt"), t, parts)
    TxLog.append(Seq(("a", 2.0), ("b", 3.0)).toDF("fleet", "amt"), t)
    TxLog.append(Seq(("b", 4.0)).toDF("fleet", "amt"), t)
    val before = rows(TxLog.read(spark, t))
    assert(TxLog.fileCount(spark, t) >= 4, "appends should accumulate files")
    TxLog.optimize(spark, t)
    assert(TxLog.fileCount(spark, t) == 2, "one file per live partition")
    assert(rows(TxLog.read(spark, t)) == before, "OPTIMIZE must not change data")
    // pre-optimize versions still travel
    assert(rows(TxLog.read(spark, t, Some(1L))) == Set(Seq("a", 1.0)))
  }

  test("crashed staging writes are invisible to readers") {
    import spark.implicits._
    val t = tmp()
    TxLog.overwrite(Seq((1L, 1.0)).toDF("id", "amt"), t)
    // simulate a writer that staged files but died before committing
    Seq((99L, 9.9)).toDF("id", "amt").write
      .parquet(s"$t/data-deadbeef-crashed")
    assert(rows(TxLog.read(spark, t)) == Set(Seq(1L, 1.0)))
  }
}
