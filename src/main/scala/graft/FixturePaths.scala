package graft

/**
 * Run-scoped roots for DuckDB-oracle fixture exports and staged audit
 * tables.
 *
 * Fixture paths are embedded verbatim in the oracle SQL strings, so
 * within ONE JVM they must be stable (the SQL and the export agree by
 * construction — see [[FixtureExport]]). Across JVMs they must NOT be
 * shared: two concurrent `Verify`/`Bench` processes writing the same
 * static path corrupt each other mid-read (observed as
 * FILE_NOT_EXIST during round 9). Each JVM therefore gets its own
 * base directory `tmp/run_<pid>`; the oracle SQL a run dumps refers
 * to that run's own exports, which outlive the JVM so the DuckDB
 * replay that follows still reads them.
 *
 * Override with `GRAFT_RUN_DIR` to pin the base (e.g. to inspect
 * fixtures from a known location, or to deliberately share a base
 * between two SEQUENTIAL runs).
 *
 * Housekeeping: on first use the JVM deletes `run_*` directories
 * whose owning pid is dead AND whose tree is older than
 * [[StaleAfterMs]] — old enough that any post-mortem DuckDB replay
 * against them has long finished, so cleanup can never race the
 * driver's Verify → oracle-check sequence.
 */
object FixturePaths {

  private val TmpRoot = "/root/repo/tmp"

  /** Dead run dirs younger than this survive GC (a finished Verify's
    * fixtures must stay readable for the DuckDB replay that follows). */
  val StaleAfterMs: Long = 2L * 60 * 60 * 1000

  lazy val base: String = {
    val b = sys.env.getOrElse("GRAFT_RUN_DIR",
      s"$TmpRoot/run_${ProcessHandle.current().pid()}")
    gcStaleRuns()
    b
  }

  /** `<base>/oracle_fixtures/<name>` — model/signature exports the
    * oracle SQL replays with read_parquet. */
  def fixture(name: String): String = s"$base/oracle_fixtures/$name"

  /** `<base>/stage/<name>` — staged audit tables an entry materializes
    * as part of its own contract (merge diffs, resident signal bases). */
  def stage(name: String): String = s"$base/stage/$name"

  private def gcStaleRuns(): Unit = {
    val root = new java.io.File(TmpRoot)
    val runs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("run_\\d+"))
    val now = System.currentTimeMillis()
    runs.foreach { dir =>
      val pid = dir.getName.stripPrefix("run_").toLong
      val alive = ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
      // staleness clock = the NEWEST mtime in the tree, not the run
      // dir's own (which only reflects direct-child creation): a
      // long-lived JVM that dies right after its last fixture write
      // must still get the full grace period for the post-mortem
      // DuckDB replay that reads those fixtures
      if (!alive && now - maxMtime(dir) > StaleAfterMs)
        try deleteTree(dir) catch { case _: java.io.IOException => () }
    }
  }

  private def maxMtime(f: java.io.File): Long = {
    val children = Option(f.listFiles()).getOrElse(Array.empty)
    (f.lastModified() +: children.map(maxMtime)).max
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(): Unit
  }
}
