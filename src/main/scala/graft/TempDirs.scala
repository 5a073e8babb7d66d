package graft

/** Central registry of scratch directories the library creates (staged
  * stream sources, ACID scenario tables, checkpoint dirs). Harnesses
  * drain the registry AFTER materializing a scenario's result and delete
  * what it returns — round 4 leaked every pass's scratch tables into
  * /tmp and later bench passes measured disk contention, not the query.
  * Nothing here deletes eagerly: a returned DataFrame may still be
  * lazily reading from these dirs until the caller materializes it.
  *
  * CONTRACT: drain()/cleanup() assume strictly SEQUENTIAL scenario
  * execution — cleanup() deletes everything registered since the last
  * drain, so a concurrently-running scenario (parallel suites, a live
  * streaming query's checkpoint dir) could have its live dirs deleted
  * by another scenario's cleanup. Verify and Bench run queries one at a
  * time on one thread, which is the only supported usage; anything that
  * must survive a later scenario's cleanup (e.g. session-lifetime
  * bucketed tables) must create its dirs OUTSIDE this registry. */
object TempDirs {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** A fresh tracked scratch dir. */
  def create(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    created.add(d)
    d
  }

  private val sessionDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var d = sessionDirs.poll()
      while (d != null) { deleteTree(d); d = sessionDirs.poll() }
    }, "graft-session-dir-cleanup"))
  }

  /** A scratch dir that OUTLIVES per-scenario cleanup (session-lifetime
    * index stores, bucketed tables) but is still reclaimed when the JVM
    * exits — without this, every distinct index key leaked its dir for
    * the machine's lifetime. */
  def createSessionLifetime(tag: String): String = {
    hookInstalled
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    sessionDirs.add(d)
    d
  }

  private def deleteTree(d: String): Unit =
    try {
      import java.nio.file._
      import scala.jdk.CollectionConverters._
      if (Files.exists(Paths.get(d)))
        Files.walk(Paths.get(d)).iterator().asScala.toSeq.reverseIterator
          .foreach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => () }

  /** Dirs created since the last drain (oldest first). */
  def drain(): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var d = created.poll()
    while (d != null) { out += d; d = created.poll() }
    out.toSeq
  }

  /** Delete every drained dir (best-effort). Call only after the
    * scenario's result has been fully materialized. */
  def cleanup(): Unit = drain().foreach(deleteTree)
}
