package graft

import org.apache.spark.sql.functions._

import graft.acid.{MaterializedView, MvSpec, TxLog}

class MaterializedViewSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mv").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("merge deleteWhen: matched source rows delete, unmatched ones never insert") {
    import spark.implicits._
    val t = tmp()
    TxLog.overwrite(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "g", "amt"), t)
    // id=1 update, id=2 delete (matched), id=9 delete-marked (unmatched: no-op),
    // id=4 plain insert
    val src = Seq((1L, "a", 11.0, false), (2L, "b", 0.0, true),
                  (9L, "z", 0.0, true), (4L, "d", 40.0, false))
      .toDF("id", "g", "amt", "kill")
    TxLog.merge(src, t, Seq("id"), deleteWhen = Some(col("kill") === true))
    assert(rows(TxLog.read(spark, t).select("id", "g", "amt")) ==
      Set(Seq(1L, "a", 11.0), Seq(3L, "c", 30.0), Seq(4L, "d", 40.0)))
    // change feed of the merge commit: update pre/post for 1, delete for 2,
    // insert for 4 — and NOTHING for the unmatched delete-marked row 9
    val feed = TxLog.readChangeFeed(spark, t, fromVersion = 2L)
      .select("id", "_change_type")
    assert(rows(feed) == Set(
      Seq(1L, "update_preimage"), Seq(1L, "update_postimage"),
      Seq(2L, "delete"), Seq(4L, "insert")))
  }

  test("merge deleteWhen referencing source columns works after projection") {
    import spark.implicits._
    val t = tmp()
    TxLog.overwrite(Seq((1L, 5.0), (2L, 6.0)).toDF("id", "amt"), t)
    // the clause references a table column of the SOURCE (amt == 0 means drop)
    TxLog.merge(Seq((1L, 0.0), (2L, 7.0)).toDF("id", "amt"), t, Seq("id"),
      deleteWhen = Some(col("amt") === 0.0))
    assert(rows(TxLog.read(spark, t)) == Set(Seq(2L, 7.0)))
  }

  test("incremental refresh stays bit-equal to recompute across mixed commits") {
    import spark.implicits._
    val base = tmp(); val mv = tmp()
    val spec = MvSpec(Seq("g"), Seq("amt"))
    val v1 = Seq((1L, "a", 1.25), (2L, "a", 2.5), (3L, "b", 10.0), (4L, "c", 7.0))
      .toDF("id", "g", "amt")
    TxLog.overwrite(v1, base)
    var cursor = MaterializedView.initialize(spark, base, mv, spec)

    def assertInSync(): Unit = {
      val view = TxLog.read(spark, mv)
      val full = MaterializedView.compute(TxLog.read(spark, base), spec)
      assert(view.exceptAll(full).isEmpty && full.exceptAll(view).isEmpty,
        s"view ${rows(view)} != recompute ${rows(full)}")
    }
    assertInSync()

    // append (insert-only commit: feed derives from add actions)
    TxLog.append(Seq((5L, "b", 0.5), (6L, "d", 3.0)).toDF("id", "g", "amt"), base)
    cursor = MaterializedView.refresh(spark, base, mv, spec, cursor)
    assertInSync()

    // update + delete in one cursor window; group c is emptied entirely
    TxLog.update(spark, base, col("g") === "a" && col("amt") > 2,
      Map("amt" -> (col("amt") + 100)))
    TxLog.delete(spark, base, col("g") === "c")
    cursor = MaterializedView.refresh(spark, base, mv, spec, cursor)
    assertInSync()
    assert(TxLog.read(spark, mv).filter(col("g") === "c").isEmpty,
      "emptied group must be deleted from the view")

    // merge: one update + one insert into a brand-new group
    TxLog.merge(Seq((1L, "a", 9.75), (7L, "e", 4.0)).toDF("id", "g", "amt"),
      base, Seq("id"))
    cursor = MaterializedView.refresh(spark, base, mv, spec, cursor)
    assertInSync()

    // no-change poll: cursor unchanged, no view commit
    val vBefore = TxLog.currentVersion(spark, mv)
    val c2 = MaterializedView.refresh(spark, base, mv, spec, cursor)
    assert(c2 == cursor)
    assert(TxLog.currentVersion(spark, mv) == vBefore)
  }

  test("refresh folds deltas without rescanning base data files") {
    import spark.implicits._
    val base = tmp(); val mv = tmp()
    val spec = MvSpec(Seq("g"), Seq("amt"))
    TxLog.overwrite(
      spark.range(1000).select(col("id"), (col("id") % 7).cast("string").as("g"),
        (col("id") * 1.5).as("amt")), base)
    var cursor = MaterializedView.initialize(spark, base, mv, spec)
    TxLog.delete(spark, base, col("id") < 10)
    // the refresh's feed read must list only cdc files — the same contract
    // ChangeFeedSpec pins for readChangeFeed; here we assert end-to-end that
    // the delta fold applied exactly the 10 deleted rows' contributions
    cursor = MaterializedView.refresh(spark, base, mv, spec, cursor)
    val view = TxLog.read(spark, mv)
    val full = MaterializedView.compute(TxLog.read(spark, base), spec)
    assert(view.exceptAll(full).isEmpty && full.exceptAll(view).isEmpty)
  }
}
