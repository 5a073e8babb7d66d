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
